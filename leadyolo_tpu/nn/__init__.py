"""NHWC flax building blocks for the TPU-native LEAD-YOLO framework."""
from . import functional
from .layers import (
    BatchNorm,
    BiFPN_Add2,
    BiFPN_Add3,
    Bottleneck,
    BottleneckCSP,
    C3,
    C3Ghost,
    C3SPP,
    C3TR,
    C3x,
    Concat,
    Conv,
    Conv2d,
    CrossConv,
    DWConv,
    DWConvTranspose2d,
    Expand,
    Contract,
    Focus,
    GhostBottleneck,
    GhostConv,
    Linear,
    MaxPool2dLayer,
    MixConv2d,
    SPP,
    SPPF,
    Sum,
    TransformerBlock,
    TransformerLayer,
    Upsample,
    ZeroPad2dLayer,
)
from .fasternet import (
    BasicStage,
    DropPath,
    MLPBlock,
    PartialConv3,
    PatchEmbedFasterNet,
    PatchMergingFasterNet,
)
from .attention import SE, C3_CA, CABottleneck, CoordAtt, SeBlock
from .rfa import RFAConv, RFCAConv, RFCBAMConv
from .backbones import (
    CBRM,
    Conv_BN_HSwish,
    G_bneck,
    MBConvBlock,
    MobileNetV3_InvertedResidual,
    Shuffle_Block,
    Stem,
)
from .extra import DecoupledHead, iRMB

"""Independent torch NCHW oracle implementations of the published block
designs (YOLOv5 v7.0 / FasterNet / CoordAtt / RFCBAM papers), written fresh
for testing the NHWC JAX blocks. Weight layout helpers convert torch<->flax.
"""
import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

BN_EPS, BN_MOM = 1e-3, 0.03


def bn2d(c, momentum=BN_MOM):
    return nn.BatchNorm2d(c, eps=BN_EPS, momentum=momentum)


class TConv(nn.Module):
    """Conv + BN + act."""

    def __init__(self, c1, c2, k=1, s=1, p=None, g=1, d=1, act="silu"):
        super().__init__()
        if p is None:
            kk = d * (k - 1) + 1 if d > 1 else k
            p = kk // 2
        self.conv = nn.Conv2d(c1, c2, k, s, p, groups=g, dilation=d, bias=False)
        self.bn = bn2d(c2)
        self.act = {"silu": nn.SiLU(), "relu": nn.ReLU(), "identity": nn.Identity()}[act]

    def forward(self, x):
        return self.act(self.bn(self.conv(x)))


class TBottleneck(nn.Module):
    def __init__(self, c1, c2, shortcut=True, g=1, e=0.5):
        super().__init__()
        c_ = int(c2 * e)
        self.cv1 = TConv(c1, c_, 1, 1)
        self.cv2 = TConv(c_, c2, 3, 1, g=g)
        self.add = shortcut and c1 == c2

    def forward(self, x):
        y = self.cv2(self.cv1(x))
        return x + y if self.add else y


class TC3(nn.Module):
    def __init__(self, c1, c2, n=1, shortcut=True, g=1, e=0.5):
        super().__init__()
        c_ = int(c2 * e)
        self.cv1 = TConv(c1, c_, 1, 1)
        self.cv2 = TConv(c1, c_, 1, 1)
        self.cv3 = TConv(2 * c_, c2, 1)
        self.m = nn.Sequential(*(TBottleneck(c_, c_, shortcut, g, e=1.0) for _ in range(n)))

    def forward(self, x):
        return self.cv3(torch.cat((self.m(self.cv1(x)), self.cv2(x)), 1))


class TSPPF(nn.Module):
    def __init__(self, c1, c2, k=5):
        super().__init__()
        c_ = c1 // 2
        self.cv1 = TConv(c1, c_, 1, 1)
        self.cv2 = TConv(c_ * 4, c2, 1, 1)
        self.m = nn.MaxPool2d(k, 1, k // 2)

    def forward(self, x):
        x = self.cv1(x)
        y1 = self.m(x)
        y2 = self.m(y1)
        return self.cv2(torch.cat((x, y1, y2, self.m(y2)), 1))


class TFocus(nn.Module):
    def __init__(self, c1, c2, k=1):
        super().__init__()
        self.conv = TConv(c1 * 4, c2, k)

    def forward(self, x):
        return self.conv(
            torch.cat((x[..., ::2, ::2], x[..., 1::2, ::2], x[..., ::2, 1::2], x[..., 1::2, 1::2]), 1)
        )


# ---- FasterNet ----


class TPConv(nn.Module):
    def __init__(self, dim, n_div=4):
        super().__init__()
        self.dc = dim // n_div
        self.conv = nn.Conv2d(self.dc, self.dc, 3, 1, 1, bias=False)

    def forward(self, x):
        x1, x2 = torch.split(x, [self.dc, x.shape[1] - self.dc], dim=1)
        return torch.cat((self.conv(x1), x2), 1)


class TMLPBlock(nn.Module):
    def __init__(self, dim, n_div=4, mlp_ratio=2):
        super().__init__()
        hidden = int(dim * mlp_ratio)
        self.sm = TPConv(dim, n_div)
        self.mlp = nn.Sequential(
            nn.Conv2d(dim, hidden, 1, bias=False), bn2d(hidden), nn.ReLU(), nn.Conv2d(hidden, dim, 1, bias=False)
        )

    def forward(self, x):
        return x + self.mlp(self.sm(x))


class TPatchEmbed(nn.Module):
    def __init__(self, c1, dim, patch=4, stride=4):
        super().__init__()
        self.proj = nn.Conv2d(c1, dim, patch, stride, bias=False)
        self.norm = bn2d(dim)

    def forward(self, x):
        return self.norm(self.proj(x))


# ---- CoordAtt ----


class TCoordAtt(nn.Module):
    def __init__(self, inp, oup, reduction=32):
        super().__init__()
        mip = max(8, inp // reduction)
        self.conv1 = nn.Conv2d(inp, mip, 1)
        self.bn1 = bn2d(mip)
        self.conv_h = nn.Conv2d(mip, oup, 1)
        self.conv_w = nn.Conv2d(mip, oup, 1)

    @staticmethod
    def hswish(x):
        return x * F.relu6(x + 3) / 6

    def forward(self, x):
        n, c, h, w = x.shape
        x_h = x.mean(3, keepdim=True)  # (n,c,h,1)
        x_w = x.mean(2, keepdim=True).permute(0, 1, 3, 2)  # (n,c,w,1)
        y = torch.cat([x_h, x_w], dim=2)
        y = self.hswish(self.bn1(self.conv1(y)))
        y_h, y_w = torch.split(y, [h, w], dim=2)
        y_w = y_w.permute(0, 1, 3, 2)
        a_h = self.conv_h(y_h).sigmoid()
        a_w = self.conv_w(y_w).sigmoid()
        return x * a_w * a_h


class TCABottleneck(nn.Module):
    def __init__(self, c1, c2, shortcut=True, g=1, e=0.5):
        super().__init__()
        c_ = int(c2 * e)
        self.cv1 = TConv(c1, c_, 1, 1)
        self.cv2 = TConv(c_, c2, 3, 1, g=g)
        self.ca = TCoordAtt(c2, c2, 32)
        self.add = shortcut and c1 == c2

    def forward(self, x):
        y = self.ca(self.cv2(self.cv1(x)))
        return x + y if self.add else y


class TC3CA(nn.Module):
    def __init__(self, c1, c2, n=1, shortcut=True, g=1, e=0.5):
        super().__init__()
        c_ = int(c2 * e)
        self.cv1 = TConv(c1, c_, 1, 1)
        self.cv2 = TConv(c1, c_, 1, 1)
        self.cv3 = TConv(2 * c_, c2, 1)
        self.m = nn.Sequential(*(TCABottleneck(c_, c_, shortcut, g, e=1.0) for _ in range(n)))

    def forward(self, x):
        return self.cv3(torch.cat((self.m(self.cv1(x)), self.cv2(x)), 1))


# ---- RFA family ----


def rearrange_taps(feat, b, c, k, h, w):
    """b (c k2) h w -> b c (h k) (w k) with tap t = n1*k + n2."""
    feat = feat.view(b, c, k * k, h, w).view(b, c, k, k, h, w)
    feat = feat.permute(0, 1, 4, 2, 5, 3)  # b c h n1 w n2
    return feat.reshape(b, c, h * k, w * k)


class TSE16(nn.Module):
    """SE with absolute hidden width (ratio is the hidden size)."""

    def __init__(self, c, ratio=16):
        super().__init__()
        self.fc = nn.Sequential(
            nn.Linear(c, ratio, bias=False), nn.ReLU(), nn.Linear(ratio, c, bias=False), nn.Sigmoid()
        )

    def forward(self, x):
        b, c = x.shape[:2]
        return self.fc(x.mean((2, 3))).view(b, c, 1, 1)


class TRFCBAMConv(nn.Module):
    def __init__(self, c1, c2, k=3, s=1):
        super().__init__()
        self.k, self.s, self.c1 = k, s, c1
        self.generate = nn.Sequential(
            nn.Conv2d(c1, c1 * k * k, k, s, k // 2, groups=c1, bias=False), bn2d(c1 * k * k), nn.ReLU()
        )
        self.get_weight = nn.Sequential(nn.Conv2d(2, 1, 3, 1, 1, bias=False), nn.Sigmoid())
        self.se = TSE16(c1)
        self.conv = nn.Sequential(nn.Conv2d(c1, c2, k, stride=k), bn2d(c2), nn.ReLU())

    def forward(self, x):
        b, c = x.shape[:2]
        ca = self.se(x)
        feat = self.generate(x)
        h, w = feat.shape[2:]
        ex = rearrange_taps(feat, b, c, self.k, h, w)
        unfold = ex * ca
        mx = ex.max(dim=1, keepdim=True)[0]
        mn = ex.mean(dim=1, keepdim=True)
        rf = self.get_weight(torch.cat((mx, mn), 1))
        return self.conv(unfold * rf)


class TRFAConv(nn.Module):
    def __init__(self, c1, c2, k=3, s=1):
        super().__init__()
        self.k, self.s = k, s
        self.get_weight = nn.Sequential(
            nn.AvgPool2d(k, padding=k // 2, stride=s), nn.Conv2d(c1, c1 * k * k, 1, groups=c1, bias=False)
        )
        self.generate = nn.Sequential(
            nn.Conv2d(c1, c1 * k * k, k, s, k // 2, groups=c1, bias=False), bn2d(c1 * k * k), nn.ReLU()
        )
        self.conv = nn.Sequential(nn.Conv2d(c1, c2, k, stride=k), bn2d(c2), nn.ReLU())

    def forward(self, x):
        b, c = x.shape[:2]
        wgt = self.get_weight(x)
        h, w = wgt.shape[2:]
        wgt = wgt.view(b, c, self.k**2, h, w).softmax(2)
        feat = self.generate(x).view(b, c, self.k**2, h, w)
        data = rearrange_taps((feat * wgt).reshape(b, c * self.k**2, h, w), b, c, self.k, h, w)
        return self.conv(data)


class TRFCAConv(nn.Module):
    def __init__(self, c1, c2, k=3, s=1, reduction=32):
        super().__init__()
        self.k, self.s = k, s
        self.generate = nn.Sequential(
            nn.Conv2d(c1, c1 * k * k, k, s, k // 2, groups=c1, bias=False), bn2d(c1 * k * k), nn.ReLU()
        )
        mip = max(8, c1 // reduction)
        self.conv1 = nn.Conv2d(c1, mip, 1)
        self.bn1 = bn2d(mip)
        self.conv_h = nn.Conv2d(mip, c1, 1)
        self.conv_w = nn.Conv2d(mip, c1, 1)
        self.conv = nn.Conv2d(c1, c2, k, stride=k)

    def forward(self, x):
        b, c = x.shape[:2]
        feat = self.generate(x)
        h, w = feat.shape[2:]
        ex = rearrange_taps(feat, b, c, self.k, h, w)
        x_h = ex.mean(3, keepdim=True)
        x_w = ex.mean(2, keepdim=True).permute(0, 1, 3, 2)
        y = torch.cat([x_h, x_w], dim=2)
        y = TCoordAtt.hswish(self.bn1(self.conv1(y)))
        hk = ex.shape[2]
        y_h, y_w = torch.split(y, [hk, ex.shape[3]], dim=2)
        y_w = y_w.permute(0, 1, 3, 2)
        a_h = self.conv_h(y_h).sigmoid()
        a_w = self.conv_w(y_w).sigmoid()
        return self.conv(ex * a_w * a_h)


# ---- weight layout helpers ----


def conv_w(t):
    """torch OIHW -> flax HWIO."""
    return np.ascontiguousarray(t.detach().numpy().transpose(2, 3, 1, 0))


def tap_w(t, k):
    """torch (O, C, k, k) stride-k conv -> (k*k, C, O) tap-contraction weight."""
    w = t.detach().numpy().transpose(2, 3, 1, 0)  # (k,k,C,O)
    return np.ascontiguousarray(w.reshape(k * k, w.shape[2], w.shape[3]))


def lin_w(t):
    return np.ascontiguousarray(t.detach().numpy().T)


def bn_params(bn):
    p = {"scale": bn.weight.detach().numpy().copy(), "bias": bn.bias.detach().numpy().copy()}
    s = {"mean": bn.running_mean.numpy().copy(), "var": bn.running_var.numpy().copy()}
    return p, s


def randomize_bn(bn, rng):
    """Give BN non-trivial affine + running stats so eval-mode parity is meaningful."""
    with torch.no_grad():
        bn.weight.copy_(torch.tensor(rng.uniform(0.5, 1.5, bn.weight.shape[0]), dtype=torch.float32))
        bn.bias.copy_(torch.tensor(rng.uniform(-0.5, 0.5, bn.bias.shape[0]), dtype=torch.float32))
        bn.running_mean.copy_(torch.tensor(rng.uniform(-0.3, 0.3, bn.bias.shape[0]), dtype=torch.float32))
        bn.running_var.copy_(torch.tensor(rng.uniform(0.5, 2.0, bn.bias.shape[0]), dtype=torch.float32))


def tconv_params(m: TConv, rng=None):
    """params/stats subtree for our Conv block from a TConv oracle."""
    if rng is not None:
        randomize_bn(m.bn, rng)
    bp, bs = bn_params(m.bn)
    return (
        {"conv": {"kernel": conv_w(m.conv.weight)}, "bn": bp},
        {"bn": bs},
    )


# ---- YOLOv5-style detection loss oracle (EIoU variant) ----


def t_bbox_eiou(box1, box2, eps=1e-7):
    """Elementwise EIoU on xywh boxes, torch."""
    (x1, y1, w1, h1), (x2, y2, w2, h2) = box1.chunk(4, -1), box2.chunk(4, -1)
    b1x1, b1x2, b1y1, b1y2 = x1 - w1 / 2, x1 + w1 / 2, y1 - h1 / 2, y1 + h1 / 2
    b2x1, b2x2, b2y1, b2y2 = x2 - w2 / 2, x2 + w2 / 2, y2 - h2 / 2, y2 + h2 / 2
    inter = (torch.min(b1x2, b2x2) - torch.max(b1x1, b2x1)).clamp(0) * (
        torch.min(b1y2, b2y2) - torch.max(b1y1, b2y1)
    ).clamp(0)
    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / (union + eps)
    cw = torch.max(b1x2, b2x2) - torch.min(b1x1, b2x1)
    ch = torch.max(b1y2, b2y2) - torch.min(b1y1, b2y1)
    c2 = cw**2 + ch**2 + eps
    rho2 = ((b2x1 + b2x2 - b1x1 - b1x2) ** 2 + (b2y1 + b2y2 - b1y1 - b1y2) ** 2) / 4
    rho_w2 = ((b2x2 - b2x1) - (b1x2 - b1x1)) ** 2
    rho_h2 = ((b2y2 - b2y1) - (b1y2 - b1y1)) ** 2
    return iou - (rho2 / c2 + rho_w2 / (cw**2 + eps) + rho_h2 / (ch**2 + eps))


class TYoloLoss:
    """YOLOv5 v7-style loss with EIoU box term; targets (n,6) = (img, cls, xywh-normalized)."""

    def __init__(self, anchors_grid, nc, hyp=None):
        self.anchors = torch.tensor(anchors_grid, dtype=torch.float32)  # (nl,na,2) grid units
        self.nl, self.na = self.anchors.shape[:2]
        self.nc = nc
        self.hyp = hyp or dict(box=0.05, obj=1.0, cls=0.5, cls_pw=1.0, obj_pw=1.0, anchor_t=4.0)
        self.balance = [4.0, 1.0, 0.4]

    def build_targets(self, p, targets):
        na, nt = self.na, targets.shape[0]
        tcls, tbox, indices, anch = [], [], [], []
        gain = torch.ones(7)
        ai = torch.arange(na).float().view(na, 1).repeat(1, nt)
        targets = torch.cat((targets.repeat(na, 1, 1), ai[..., None]), 2)
        g = 0.5
        off = torch.tensor([[0, 0], [1, 0], [0, 1], [-1, 0], [0, -1]]).float() * g
        for i in range(self.nl):
            anchors, shape = self.anchors[i], p[i].shape
            gain[2:6] = torch.tensor(shape)[[3, 2, 3, 2]]
            t = targets * gain
            if nt:
                r = t[..., 4:6] / anchors[:, None]
                jm = torch.max(r, 1 / r).max(2)[0] < self.hyp["anchor_t"]
                t = t[jm]
                gxy = t[:, 2:4]
                gxi = gain[[2, 3]] - gxy
                j, k = ((gxy % 1 < g) & (gxy > 1)).T
                l, m = ((gxi % 1 < g) & (gxi > 1)).T
                j = torch.stack((torch.ones_like(j), j, k, l, m))
                t = t.repeat((5, 1, 1))[j]
                offsets = (torch.zeros_like(gxy)[None] + off[:, None])[j]
            else:
                t = targets[0]
                offsets = 0
            bc, gxy, gwh, a = t.chunk(4, 1)
            a, (b, c) = a.long().view(-1), bc.long().T
            gij = (gxy - offsets).long()
            gi, gj = gij.T
            indices.append((b, a, gj.clamp_(0, shape[2] - 1), gi.clamp_(0, shape[3] - 1)))
            tbox.append(torch.cat((gxy - gij, gwh), 1))
            anch.append(anchors[a])
            tcls.append(c)
        return tcls, tbox, indices, anch

    def __call__(self, p, targets):
        """p: list of (B, na, ny, nx, no) raw maps."""
        lcls = torch.zeros(1)
        lbox = torch.zeros(1)
        lobj = torch.zeros(1)
        tcls, tbox, indices, anchors = self.build_targets(p, targets)
        h = self.hyp
        for i, pi in enumerate(p):
            b, a, gj, gi = indices[i]
            tobj = torch.zeros(pi.shape[:4])
            n = b.shape[0]
            if n:
                pxy, pwh, _, pcls = pi[b, a, gj, gi].split((2, 2, 1, self.nc), 1)
                pxy = pxy.sigmoid() * 2 - 0.5
                pwh = (pwh.sigmoid() * 2) ** 2 * anchors[i]
                pbox = torch.cat((pxy, pwh), 1)
                iou = t_bbox_eiou(pbox, tbox[i]).squeeze(-1)
                lbox += (1.0 - iou).mean()
                iou = iou.detach().clamp(0)
                tobj[b, a, gj, gi] = iou
                if self.nc > 1:
                    t = torch.full_like(pcls, 0.0)
                    t[range(n), tcls[i]] = 1.0
                    lcls += F.binary_cross_entropy_with_logits(
                        pcls, t, pos_weight=torch.tensor([h["cls_pw"]])
                    )
            lobj += F.binary_cross_entropy_with_logits(
                pi[..., 4], tobj, pos_weight=torch.tensor([h["obj_pw"]])
            ) * self.balance[i]
        bs = tobj.shape[0]
        lbox *= h["box"]
        lobj *= h["obj"]
        lcls *= h["cls"]
        return (lbox + lobj + lcls) * bs, (lbox.item(), lobj.item(), lcls.item())

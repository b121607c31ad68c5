"""Map reference torch state dicts onto our flax variable trees.

Together with torch_import.py this is the checkpoint converter (SURVEY.md §5:
"a one-time torch->JAX weight converter for the shipped .pt artifacts"): we
walk OUR initialized variable tree, translate every leaf path into candidate
torch parameter names (the naming differences are purely structural — flax
auto-names list children ``name_i`` where torch Sequentials use ``name.i``),
fetch, and apply the layout transform (OIHW->HWIO convs, transposed linears,
the RFA tap-contraction reshape, MultiheadAttention in_proj slicing).
"""
from __future__ import annotations

from typing import Dict, List

import jax
import numpy as np

# direct component renames (ours -> torch)
_RENAME = {
    "generate_conv": ["generate.0"],
    "generate_bn": ["generate.1"],
    "get_weight_conv": ["get_weight.0", "get_weight.1"],  # RFCBAM vs RFAConv
    "conv_bn": ["conv.1"],
    "conv_se": ["conv.2"],
    "mlp_0": ["mlp.0"],
    "mlp_1": ["mlp.1"],
    "mlp_3": ["mlp.3"],
    "fc_0": ["fc.0"],
    "fc_2": ["fc.2"],
    "fc1": ["Excitation.FC1", "fc1"],
    "fc2": ["Excitation.FC2", "fc2"],
    "b1_dw": ["branch1.0"],
    "b1_dw_bn": ["branch1.1"],
    "b1_pw": ["branch1.2"],
    "b1_pw_bn": ["branch1.3"],
    "b2_pw1": ["branch2.0"],
    "b2_pw1_bn": ["branch2.1"],
    "b2_dw": ["branch2.3"],
    "b2_dw_bn": ["branch2.4"],
    "b2_pw2": ["branch2.5"],
    "b2_pw2_bn": ["branch2.6"],
    "expand_conv": ["_expand_conv"],
    "bn0": ["_bn0"],
    "depthwise_conv": ["_depthwise_conv"],
    # NOTE: plain 'bn1' must stay 'bn1' for CoordAtt; MBConv handled by candidates
    "bn1": ["bn1", "_bn1"],
    "bn2": ["bn2", "_bn2"],
    "project_conv": ["_project_conv"],
    # MobileNetV3 inverted residual (two Sequential layouts)
    "exp": ["conv.0"],
    "exp_bn": ["conv.1"],
    "dw": ["conv.3", "conv.0", ""],  # mnv3-expand, mnv3-noexpand; DWConv block is transparent
    "dw_bn": ["conv.4", "conv.1"],
    "pw": ["conv.7", "conv.4"],
    "pw_bn": ["conv.8", "conv.5"],
    "se": ["conv.5", "conv.3", "se"],
    # CBRM packs conv+bn+relu in one Sequential named conv
    "conv": ["conv", "conv.0"],
    "bn": ["bn", "conv.1"],
}


def _component_options(comp: str) -> List[str]:
    if comp in _RENAME:
        return _RENAME[comp]
    # generic list-child pattern: name_3 -> name.3 (but keep literal names
    # like conv_h / conv_w / layer_scale / in-proj parts)
    if "_" in comp:
        head, _, tail = comp.rpartition("_")
        if tail.isdigit():
            if head == "layers":  # Stack children: bare index in torch Sequential
                return [tail]
            return [f"{head}.{tail}", comp]
    return [comp]


def _leaf_options(collection: str, leaf: str, parent: str) -> List[str]:
    if collection == "batch_stats":
        return {"mean": ["running_mean"], "var": ["running_var"]}[leaf]
    if leaf == "kernel":
        return ["weight"]
    if leaf == "scale":
        return ["weight"]
    if leaf == "conv_kernel":
        return ["conv.0.weight", "conv.weight"]
    if leaf == "conv_bias":
        return ["conv.0.bias", "conv.bias"]
    return [leaf]


def _candidates(path, collection: str) -> List[str]:
    """All torch-name candidates for one of our variable paths."""
    comps = [p.key if hasattr(p, "key") else str(p) for p in path]
    assert comps[0].startswith("layers_"), comps
    heads = [f"model.{comps[0].split('_')[1]}"]
    mids = comps[1:-1]
    leaf = comps[-1]

    option_lists = [_component_options(c) for c in mids]
    tails = _leaf_options(collection, leaf, mids[-1] if mids else "")

    outs = [""]
    for opts in option_lists:
        outs = [o + ("." + v if v else "") if o else v for o in outs for v in opts]
    results = []
    for h in heads:
        for o in outs:
            for t in tails:
                parts = [h] + ([o] if o else []) + ([t] if t else [])
                results.append(".".join(parts))
    return results


def _transform(leaf_name: str, torch_key: str, arr: np.ndarray, target_shape) -> np.ndarray:
    a = np.asarray(arr, np.float32)
    if leaf_name == "conv_kernel":
        # (O, C, k, k) stride-k conv -> (k*k, C, O) tap contraction
        o, c, k, _ = a.shape
        return np.ascontiguousarray(a.transpose(2, 3, 1, 0).reshape(k * k, c, o))
    if leaf_name == "kernel":
        if a.ndim == 4:  # conv OIHW -> HWIO
            return np.ascontiguousarray(a.transpose(2, 3, 1, 0))
        if a.ndim == 2:  # linear (out, in) -> (in, out)
            return np.ascontiguousarray(a.T)
    return a


def convert_state(variables, state: Dict[str, np.ndarray], strict: bool = True):
    """Fill our variable tree from a torch name->array state dict.

    Returns (new_variables, report) where report lists matched/missing/unused.
    """
    used = set()
    missing = []

    def fill(collection):
        def get(path, leaf_val):
            leaf_name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
            for cand in _candidates(path, collection):
                if cand in state:
                    used.add(cand)
                    out = _transform(leaf_name, cand, state[cand], leaf_val.shape)
                    if out.shape != leaf_val.shape:
                        raise ValueError(
                            f"shape mismatch {cand}: torch {out.shape} vs ours {tuple(leaf_val.shape)} at {path}"
                        )
                    return out.astype(np.asarray(leaf_val).dtype)
            missing.append("/".join(str(getattr(p, 'key', p)) for p in path))
            return np.asarray(leaf_val)

        return jax.tree_util.tree_map_with_path(get, variables[collection])

    new_vars = {c: fill(c) for c in variables}
    unused = [
        k
        for k in state
        if k not in used and not k.endswith(("anchors", "anchor_grid")) and "num_batches_tracked" not in k
    ]
    report = {"missing": missing, "unused": unused, "matched": len(used)}
    if strict and missing:
        raise KeyError(f"unmatched variables ({len(missing)}): {missing[:10]}...")
    return new_vars, report


def load_reference_checkpoint(model, ckpt_path, strict: bool = True):
    """End-to-end: reference .pt -> our variables for ``model``
    (a DetectionModel built from the matching config)."""
    import jax.numpy  # noqa: F401
    from .torch_import import extract_state

    state, meta = extract_state(ckpt_path)
    variables = model.init(jax.random.PRNGKey(0))
    new_vars, report = convert_state(variables, state, strict=strict)
    return new_vars, meta, report

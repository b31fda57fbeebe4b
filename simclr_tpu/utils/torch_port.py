"""PyTorch checkpoint interop: import reference-style SimCLR weights.

The reference trains `SimCLRMain` (reference: models/simclr.py:6-46), a
torchvision ResNet-50 encoder with CIFAR stem surgery
(reference: models/resnets.py:8-36) plus a projection head
(reference: models/simclr.py:27-41), and exports TorchScript artifacts
consumed downstream (reference: utils/model_utils.py:165-173,
models/ssl.py:24). This module maps a torch ``state_dict`` with that layout
onto this framework's flax parameter tree, so users migrating from the
reference can carry their pretrained checkpoints over:

    import torch
    sd = torch.jit.load("simclr.pt").state_dict()          # or a plain sd
    params, batch_stats = simclr_from_torch_state_dict(sd)

No torch import is required here — the converter consumes any mapping of
name -> array-like (torch tensors, numpy arrays). Layout conversions:

  * Conv2d weight (O, I, kh, kw)  -> flax kernel (kh, kw, I, O)
  * Linear weight (out, in)      -> flax kernel (in, out)
  * BatchNorm weight/bias        -> scale/bias params
  * BatchNorm running_mean/var   -> batch_stats mean/var

Name mapping (torchvision -> this framework):

  conv1, bn1                         -> f/stem_conv, f/stem_bn
  layer{L}.{B}.conv{i}/bn{i}         -> f/layer{L}_{B}/conv{i}|bn{i}
  layer{L}.{B}.downsample.0|1        -> f/layer{L}_{B}/downsample_conv|_bn
  g.g_linear{i} / g.g_bn{i}          -> g/linear{i}, g/bn{i}
    (the reference names its head sub-modules via add_module,
    reference models/simclr.py:28-39; plain numeric nn.Sequential
    indices `g.{j}` from hand-built exports are tolerated too)
  supervised_head.1 Linear           -> supervised_head (fine-tune model;
    reference models/ssl.py:29-30 wraps it as Sequential(Flatten, Linear),
    bare `supervised_head.weight` keys are tolerated too)

The inverse direction (`simclr_to_torch_state_dict`) emits a reference-layout
state_dict from flax params, used by the cross-implementation fidelity tests
(tests/test_torch_parity.py) and for exporting back to torch consumers.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Tuple

import numpy as np


def _np(x) -> np.ndarray:
    """Coerce torch tensors / jax arrays / numpy to float32 numpy.

    Always copies: torch's `.numpy()` SHARES memory with the live tensor,
    so without a copy the converted tree would silently mutate whenever the
    torch model is updated in place (optimizer steps, BN running stats).
    """
    if hasattr(x, "detach"):  # torch.Tensor
        x = x.detach().cpu().numpy()
    return np.array(x, dtype=np.float32, copy=True)


def _conv_kernel(w) -> np.ndarray:
    return _np(w).transpose(2, 3, 1, 0)  # (O,I,kh,kw) -> (kh,kw,I,O)


def _set(tree: Dict[str, Any], path: Tuple[str, ...], value) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


# torchvision encoder prefixes. The reference wraps the encoder as `f`
# inside SimCLRMain (reference: models/simclr.py:16-25), so keys may appear
# as either `conv1.weight` (bare encoder) or `f.conv1.weight`.
_BOTTLENECK = re.compile(
    r"^layer(?P<stage>\d+)\.(?P<block>\d+)\.(?P<rest>.+)$")


def _encoder_entry(rest: str):
    """Map a torchvision-resnet key suffix to (module, leaf) names."""
    mod, _, leaf = rest.partition(".")
    if mod in ("conv1", "conv2", "conv3"):
        return mod, leaf
    if mod in ("bn1", "bn2", "bn3"):
        return mod, leaf
    if mod == "downsample":
        idx, _, leaf2 = leaf.partition(".")
        return ("downsample_conv" if idx == "0" else "downsample_bn"), leaf2
    raise KeyError(rest)


def _assign_bn(params, stats, path, leaf, value):
    if leaf == "weight":
        _set(params, path + ("scale",), _np(value))
    elif leaf == "bias":
        _set(params, path + ("bias",), _np(value))
    elif leaf == "running_mean":
        _set(stats, path + ("mean",), _np(value))
    elif leaf == "running_var":
        _set(stats, path + ("var",), _np(value))
    # num_batches_tracked is dropped (flax keeps no counter).


def simclr_from_torch_state_dict(
    state_dict: Mapping[str, Any],
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Convert a reference-layout torch state_dict to (params, batch_stats)
    trees matching `simclr_tpu.models.simclr.SimCLR`.

    Accepts the bare `SimCLRMain` layout (`f.*` encoder keys and `g.*` head
    keys, reference models/simclr.py:16-41) and, for the fine-tune model,
    `supervised_head.*` (reference models/ssl.py:29-31).
    """
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    head_linear: Dict[int, Dict[str, Any]] = {}
    head_bn: Dict[int, Dict[str, Any]] = {}

    for key, value in state_dict.items():
        if key.endswith("num_batches_tracked"):
            continue
        parts = key.split(".")
        if parts[0] == "f":
            parts = parts[1:]
        elif parts[0] == "g":
            # Reference head sub-modules are NAMED via add_module
            # ("g_linear0", "g_bn0", ... — reference models/simclr.py:28-39),
            # so genuine reference checkpoints carry `g.g_linear{i}.*` /
            # `g.g_bn{i}.*` keys. Map those directly.
            named = re.match(r"^g_(linear|bn)(\d+)$", parts[1])
            if named is not None:
                kind, i = named.group(1), int(named.group(2))
                leaf = parts[2]
                if kind == "linear":
                    if leaf == "weight":
                        _set(params, ("g", f"linear{i}", "kernel"),
                             _np(value).T)
                    elif leaf == "bias":
                        _set(params, ("g", f"linear{i}", "bias"), _np(value))
                else:
                    _assign_bn(params, stats, ("g", f"bn{i}"), leaf, value)
                continue
            # Fallback: a plain numeric nn.Sequential layout (index 0 is
            # Flatten, then alternating Linear / BatchNorm1d; ReLU/Dropout
            # hold no params). Collect by module index, order-normalize
            # below.
            idx = int(parts[1])
            leaf = parts[2]
            if leaf == "weight":
                # Linear weights are 2-D, BatchNorm1d weights 1-D.
                target = head_linear if _np(value).ndim == 2 else head_bn
                target.setdefault(idx, {})[leaf] = value
            elif leaf == "bias":
                # A module's weight precedes its bias in state_dict order,
                # so the index is already classified.
                target = head_linear if idx in head_linear else head_bn
                target.setdefault(idx, {})[leaf] = value
            elif leaf in ("running_mean", "running_var"):
                head_bn.setdefault(idx, {})[leaf] = value
            continue
        elif parts[0] == "supervised_head":
            # Sequential(Flatten, Linear) -> `supervised_head.1.{weight,bias}`
            # (reference: models/ssl.py:29-30); `parts[-1]` also tolerates a
            # bare-Linear `supervised_head.{weight,bias}` layout.
            leaf = parts[-1]
            if leaf == "weight":
                _set(params, ("supervised_head", "kernel"),
                     _np(value).T)
            else:
                _set(params, ("supervised_head", "bias"), _np(value))
            continue

        key_e = ".".join(parts)
        mod, _, leaf = key_e.partition(".")
        m = _BOTTLENECK.match(key_e)
        if m is not None:
            name = f"layer{m.group('stage')}_{m.group('block')}"
            sub, leaf = _encoder_entry(m.group("rest"))
            path = ("f", name, sub)
        elif mod == "conv1":
            path = ("f", "stem_conv")
        elif mod == "bn1":
            path = ("f", "stem_bn")
        elif mod == "fc":
            continue  # reference encoder discards fc (models/resnets.py:34)
        else:
            raise KeyError(f"unrecognized reference key: {key}")

        if "conv" in path[-1]:
            _set(params, path + ("kernel",), _conv_kernel(value))
        else:
            _assign_bn(params, stats, path, leaf, value)

    # Order-normalize the head: sorted module indices alternate
    # Linear, BN, Linear, BN, ... -> linear0, bn0, linear1, bn1, ...
    for rank, idx in enumerate(sorted(head_linear)):
        entry = head_linear[idx]
        _set(params, ("g", f"linear{rank}", "kernel"), _np(entry["weight"]).T)
        if "bias" in entry:
            _set(params, ("g", f"linear{rank}", "bias"), _np(entry["bias"]))
    for rank, idx in enumerate(sorted(head_bn)):
        entry = head_bn[idx]
        _assign_bn(params, stats, ("g", f"bn{rank}"), "weight",
                   entry["weight"])
        _assign_bn(params, stats, ("g", f"bn{rank}"), "bias", entry["bias"])
        _assign_bn(params, stats, ("g", f"bn{rank}"), "running_mean",
                   entry["running_mean"])
        _assign_bn(params, stats, ("g", f"bn{rank}"), "running_var",
                   entry["running_var"])
    return params, stats


def simclr_to_torch_state_dict(params, batch_stats) -> Dict[str, np.ndarray]:
    """Inverse of `simclr_from_torch_state_dict`: emit a reference-layout
    state_dict (numpy values) from flax trees — `f.*` torchvision encoder
    keys and named `g.g_linear{i}` / `g.g_bn{i}` head keys exactly as the
    reference's add_module layout produces them (reference:
    models/simclr.py:28-39), so reference SimCLRMain.load_state_dict
    accepts the export.
    """
    out: Dict[str, np.ndarray] = {}

    def bn(prefix_t: str, p, s):
        out[f"{prefix_t}.weight"] = _np(p["scale"])
        out[f"{prefix_t}.bias"] = _np(p["bias"])
        out[f"{prefix_t}.running_mean"] = _np(s["mean"])
        out[f"{prefix_t}.running_var"] = _np(s["var"])

    f_p, f_s = params["f"], batch_stats["f"]
    out["f.conv1.weight"] = _np(
        f_p["stem_conv"]["kernel"]).transpose(3, 2, 0, 1)
    bn("f.bn1", f_p["stem_bn"], f_s["stem_bn"])
    for name in sorted(k for k in f_p if k.startswith("layer")):
        stage, block = name[len("layer"):].split("_")
        t_pre = f"f.layer{stage}.{block}"
        mods = f_p[name]
        for conv in ("conv1", "conv2", "conv3"):
            out[f"{t_pre}.{conv}.weight"] = _np(
                mods[conv]["kernel"]).transpose(3, 2, 0, 1)
            bn(f"{t_pre}.bn{conv[-1]}", mods[f"bn{conv[-1]}"],
               f_s[name][f"bn{conv[-1]}"])
        if "downsample_conv" in mods:
            out[f"{t_pre}.downsample.0.weight"] = _np(
                mods["downsample_conv"]["kernel"]).transpose(3, 2, 0, 1)
            bn(f"{t_pre}.downsample.1", mods["downsample_bn"],
               f_s[name]["downsample_bn"])

    # Head sub-modules are named via add_module in the reference
    # (models/simclr.py:28-39): g_flatten, g_linear0, g_bn0, g_relu0, ...,
    # g_linear{n-1} (no bias), g_bn{n-1}. Only Linear/BN carry params.
    g_p, g_s = params["g"], batch_stats["g"]
    n_layers = sum(1 for k in g_p if k.startswith("linear"))
    for i in range(n_layers):
        lin = g_p[f"linear{i}"]
        out[f"g.g_linear{i}.weight"] = _np(lin["kernel"]).T
        if "bias" in lin:
            out[f"g.g_linear{i}.bias"] = _np(lin["bias"])
        bn(f"g.g_bn{i}", g_p[f"bn{i}"], g_s[f"bn{i}"])

    if "supervised_head" in params:
        # Sequential(Flatten, Linear) -> index 1 (reference models/ssl.py:
        # 29-30), so the export loads into reference SimCLRFineTune.
        out["supervised_head.1.weight"] = _np(
            params["supervised_head"]["kernel"]).T
        out["supervised_head.1.bias"] = _np(params["supervised_head"]["bias"])
    return out

"""Import reference PyTorch checkpoints into deeplip_tpu parameter trees.

The embedding-parity bar (BASELINE.md: ≤1e-4 vs the reference with the same
weights) needs a weight bridge. This maps the reference ``SpeakerEmbNet``
state_dict layout (``models/audio_models/tdnn.py``) onto our Flax tree:

    tdnn.{i}.context_layer.{weight,bias} -> tdnn_{i}/conv (OIK -> KIO)
    tdnn.{i}.bn.*                        -> tdnn_{i}/bn (+ batch_stats)
    fc1/fc2 (out,in)                     -> Dense kernel (in,out)
    bn1/bn2                              -> BatchNorm (+ batch_stats)
    pooling.{W,b,v,k}                    -> pooling params (attentive variants)

Handles the reference's own checkpoint quirks (``tdnn.py:123-128``): the
``module.`` DataParallel prefix is stripped and ``fc3``-prefixed keys are
skipped. Input is either a ``torch.load``-able path or an already-loaded
mapping of arrays.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np


def _to_numpy(v) -> np.ndarray:
    if hasattr(v, "detach"):
        return v.detach().cpu().numpy()
    return np.asarray(v)


def _clean_state_dict(state_dict: Mapping[str, Any]) -> dict[str, np.ndarray]:
    out = {}
    for k, v in state_dict.items():
        k = k.replace("module.", "")
        if k.startswith("fc3") or k.endswith("num_batches_tracked"):
            continue
        out[k] = _to_numpy(v)
    return out


def import_speaker_embnet_state_dict(
    state_dict: Mapping[str, Any], n_blocks: int
) -> tuple[dict, dict]:
    """Returns ``(params, batch_stats)`` for ``models.tdnn.SpeakerEmbNet``."""
    sd = _clean_state_dict(state_dict)
    params: dict[str, Any] = {}
    stats: dict[str, Any] = {}

    def bn(prefix: str):
        p = {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}
        s = {"mean": sd[f"{prefix}.running_mean"], "var": sd[f"{prefix}.running_var"]}
        return p, s

    for i in range(n_blocks):
        w = sd[f"tdnn.{i}.context_layer.weight"]  # (out, in, k)
        kernel = np.transpose(w, (2, 1, 0))  # (k, in, out) = flax Conv HIO
        bn_p, bn_s = bn(f"tdnn.{i}.bn")
        params[f"tdnn_{i}"] = {
            "conv": {"kernel": kernel, "bias": sd[f"tdnn.{i}.context_layer.bias"]},
            "bn": bn_p,
        }
        stats[f"tdnn_{i}"] = {"bn": bn_s}

    for name in ("fc1", "fc2"):
        params[name] = {
            "kernel": sd[f"{name}.weight"].T,
            "bias": sd[f"{name}.bias"],
        }
    for name in ("bn1", "bn2"):
        p, s = bn(name)
        params[name] = p
        stats[name] = s

    # attentive pooling parameters, when present
    pool = {}
    for pname in ("W", "b", "v", "k"):
        key = f"pooling.{pname}"
        if key in sd:
            pool[pname] = sd[key]
    if pool:
        params["pool"] = pool

    return params, stats


def import_lmcl_state_dict(state_dict: Mapping[str, Any]) -> dict:
    """LMCL criterion weights (``loss.py:40``) -> our LMCL params."""
    sd = _clean_state_dict(state_dict)
    return {"weights": sd["weights"]}


def load_reference_audio_checkpoint(path: str, n_blocks: int) -> tuple[dict, dict]:
    """torch.load a reference ``net_*.pth`` and convert (requires torch)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state_dict = ckpt.get("state_dict", ckpt)
    return import_speaker_embnet_state_dict(state_dict, n_blocks)


# ---------------------------------------------------------------------------
# video (Lipreading) import: frontend3D + ResNet trunk
# ---------------------------------------------------------------------------

def import_lipreading_state_dict(
    state_dict: Mapping[str, Any], layers: tuple[int, ...] = (2, 2, 2, 2)
) -> tuple[dict, dict]:
    """Reference ``Lipreading`` weights -> our frame-feature path params.

    Covers the ``extract_feats`` path (frontend3D + per-frame trunk,
    ``models/video_models/model.py:96-104``) — the part consumed by fusion
    training and clip-embedding extraction. Reference layout:

        frontend3D.0.weight            Conv3d OIDHW -> flax DHWIO
        frontend3D.1.*                 BatchNorm3d
        frontend3D.2.weight            PReLU (per-channel)
        trunk.layer{1..4}.{i}.conv1/bn1/relu1/conv2/bn2/relu2
        trunk.layer{s}.0.downsample.{0,1}   1x1 conv + BN

    Returns ``(params, batch_stats)`` for
    :class:`deeplip_tpu.models.lipreading.Lipreading` (TCN/classifier keys
    are left at their initialized values and must be merged by the caller).
    """
    sd = _clean_state_dict(state_dict)
    params: dict[str, Any] = {}
    stats: dict[str, Any] = {}

    def bn(prefix: str):
        return (
            {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]},
            {"mean": sd[f"{prefix}.running_mean"], "var": sd[f"{prefix}.running_var"]},
        )

    params["frontend_conv"] = {
        "kernel": np.transpose(sd["frontend3D.0.weight"], (2, 3, 4, 1, 0))
    }
    p, s = bn("frontend3D.1")
    params["frontend_bn"] = p
    stats["frontend_bn"] = s
    if "frontend3D.2.weight" in sd:
        params["frontend_prelu"] = {"alpha": sd["frontend3D.2.weight"]}

    trunk_p: dict[str, Any] = {}
    trunk_s: dict[str, Any] = {}
    for stage, n in enumerate(layers, start=1):
        for i in range(n):
            ref = f"trunk.layer{stage}.{i}"
            name = f"layer{stage}_block{i}"
            bp: dict[str, Any] = {}
            bs: dict[str, Any] = {}
            for conv, bnn in (("conv1", "bn1"), ("conv2", "bn2")):
                bp[conv] = {"kernel": np.transpose(sd[f"{ref}.{conv}.weight"], (2, 3, 1, 0))}
                p, s = bn(f"{ref}.{bnn}")
                bp[bnn] = p
                bs[bnn] = s
            for relu, alias in (("relu1", "relu1"), ("relu2", "relu2")):
                key = f"{ref}.{relu}.weight"
                if key in sd:  # PReLU
                    bp[alias] = {"alpha": sd[key]}
            if f"{ref}.downsample.0.weight" in sd:
                bp["down_conv"] = {
                    "kernel": np.transpose(sd[f"{ref}.downsample.0.weight"], (2, 3, 1, 0))
                }
                p, s = bn(f"{ref}.downsample.1")
                bp["down_bn"] = p
                bs["down_bn"] = s
            trunk_p[name] = bp
            trunk_s[name] = bs
    params["trunk"] = trunk_p
    stats["trunk"] = trunk_s
    return params, stats

"""Export deeplip_tpu parameter trees to reference PyTorch state_dicts.

The inverse of :mod:`deeplip_tpu.interop.torch_import`: a model trained on
TPU with this framework can be handed back to the reference's torch tooling
(``train_audio.py:266-273`` ``Trainer.load``, ``train_fusion.py:180-188``,
or any torch consumer of the reference layouts). Every mapping here is the
exact inverse of the corresponding importer, so export→import round-trips
bit-equal (``tests/test_interop.py``) and a torch net built with the
reference state_dict layout loads the export with ``strict=True`` —
including the ``num_batches_tracked`` buffers torch requires (emitted as 0;
the reference's BNs use fixed momentum, which never reads them).

Checkpoint container formats mirror the reference savers:

- audio/fusion (``train_audio.py:261-264``, ``train_fusion.py:176-179``):
  ``{'epoch', 'state_dict', 'optimizer'}`` — ``optimizer`` is saved as an
  empty dict (the reference's ``load`` never restores it — commented out at
  ``train_audio.py:271-273`` — but its fusion ``model_average`` reads the
  key, ``train_fusion.py:171-173``). The reference pickles its live
  criterion *module* under ``'criterion'``; that class doesn't exist here,
  so criterion weights are exported as a plain tensor dict under
  ``'criterion_state_dict'`` (the reference loader ignores both).
- video (``train_video.py:169``): the raw ``state_dict`` alone.

Reference checkpoints are saved from ``DataParallel``-wrapped modules, so
their keys carry a ``module.`` prefix; pass ``data_parallel_prefix=True``
to reproduce that (needed only to feed a wrapped reference trainer
directly — the reference's own import path strips it, ``tdnn.py:123-128``).
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np


def _np(v) -> np.ndarray:
    return np.asarray(v)


def _bn(out: dict, prefix: str, p: Mapping[str, Any], s: Mapping[str, Any]):
    out[f"{prefix}.weight"] = _np(p["scale"])
    out[f"{prefix}.bias"] = _np(p["bias"])
    out[f"{prefix}.running_mean"] = _np(s["mean"])
    out[f"{prefix}.running_var"] = _np(s["var"])
    out[f"{prefix}.num_batches_tracked"] = np.asarray(0, np.int64)


def _dense(out: dict, prefix: str, p: Mapping[str, Any]):
    out[f"{prefix}.weight"] = np.ascontiguousarray(_np(p["kernel"]).T)
    if "bias" in p:
        out[f"{prefix}.bias"] = _np(p["bias"])


def _conv1d(out: dict, prefix: str, p: Mapping[str, Any]):
    # flax Conv (K, I, O) -> torch Conv1d (O, I, K)
    out[f"{prefix}.weight"] = np.ascontiguousarray(
        np.transpose(_np(p["kernel"]), (2, 1, 0)))
    if "bias" in p:
        out[f"{prefix}.bias"] = _np(p["bias"])


def _conv2d(out: dict, prefix: str, p: Mapping[str, Any]):
    # flax Conv (H, W, I, O) -> torch Conv2d (O, I, H, W)
    out[f"{prefix}.weight"] = np.ascontiguousarray(
        np.transpose(_np(p["kernel"]), (3, 2, 0, 1)))
    if "bias" in p:
        out[f"{prefix}.bias"] = _np(p["bias"])


def _apply_prefix(sd: dict, data_parallel_prefix: bool) -> dict:
    if not data_parallel_prefix:
        return sd
    return {f"module.{k}": v for k, v in sd.items()}


def export_speaker_embnet_state_dict(
    params: Mapping[str, Any], batch_stats: Mapping[str, Any],
    pooling: str = "attentive_statistic", data_parallel_prefix: bool = False,
) -> dict[str, np.ndarray]:
    """Our ``models.tdnn.SpeakerEmbNet`` tree -> the reference layout
    (``models/audio_models/tdnn.py``: ``tdnn.{i}.context_layer/.bn``,
    ``fc1/bn1/fc2/bn2``, attentive ``pooling.{W,b,v,k}``).

    ``pooling`` picks the reference parameter layout when the tree has a
    ``pool`` entry: ``attentive_statistic`` stores the 2-D tensors as-is
    (``pooling.py:79-82``); ``mono_head_attention`` adds the reference's
    leading broadcast axes (``pooling.py:34-37``).
    """
    out: dict[str, np.ndarray] = {}
    n_blocks = sum(1 for k in params if k.startswith("tdnn_"))
    if n_blocks == 0:
        raise ValueError(
            "not a SpeakerEmbNet (TDNN/E-TDNN) param tree: no tdnn_{i} "
            "blocks. Only the TDNN family exports — the reference defines "
            "no checkpoint consumers for its 2D-CNN arch "
            "(train_audio.py:258: extraction unimplemented for it)")
    for i in range(n_blocks):
        blk = params[f"tdnn_{i}"]
        _conv1d(out, f"tdnn.{i}.context_layer", blk["conv"])
        _bn(out, f"tdnn.{i}.bn", blk["bn"], batch_stats[f"tdnn_{i}"]["bn"])
    for name in ("fc1", "fc2"):
        _dense(out, name, params[name])
    for name in ("bn1", "bn2"):
        _bn(out, name, params[name], batch_stats[name])
    if "pool" in params:
        pool = params["pool"]
        for pname in ("W", "b", "v", "k"):
            if pname not in pool:
                continue
            t = _np(pool[pname])
            if pooling == "mono_head_attention":
                if pname == "W":          # (H, C) -> (1, H, C)
                    t = t[None]
                elif pname == "b":        # (H, 1) -> (1, H, 1)
                    t = t.reshape(1, -1, 1)
                elif pname == "v":        # (1, H) -> (1, 1, H)
                    t = t.reshape(1, 1, -1)
                else:                     # () or (1, 1) -> (1, 1, 1)
                    t = t.reshape(1, 1, 1)
            out[f"pooling.{pname}"] = t
    return _apply_prefix(out, data_parallel_prefix)


def export_lmcl_state_dict(params: Mapping[str, Any]) -> dict[str, np.ndarray]:
    """Our LMCL criterion params -> reference ``loss.py:40`` layout."""
    return {"weights": _np(params["weights"])}


def export_criterion_state_dict(
    params: Mapping[str, Any],
) -> dict[str, np.ndarray] | None:
    """Inverse of :func:`torch_import.import_criterion_state_dict`: our
    criterion params -> the reference criterion layout (CrossEntropy
    ``fc.weight/fc.bias`` or LMCL ``weights``). None if unrecognized."""
    if "fc" in params:
        out: dict[str, np.ndarray] = {}
        _dense(out, "fc", params["fc"])
        return out
    if "weights" in params:
        return export_lmcl_state_dict(params)
    return None


def export_lowfer_state_dict(params: Mapping[str, Any]) -> dict[str, np.ndarray]:
    """Our LowFER head params -> reference ``LBP.py:12-15`` (U, V)."""
    return {"U": _np(params["U"]), "V": _np(params["V"])}


def export_shufflenet_trunk_state_dict(
    params: Mapping[str, Any], stats: Mapping[str, Any],
    prefix: str = "trunk.0.",
) -> dict[str, np.ndarray]:
    """Inverse of :func:`torch_import.import_shufflenet_trunk_state_dict`:
    our ``ShuffleNetV2Trunk`` tree -> the reference
    ``Sequential(features, conv_last)`` layout (``shufflenetv2.py:52-89``:
    ``banch1`` = dw/bn/pw/bn/relu, ``banch2`` = pw/bn/relu/dw/bn/pw/bn/relu)."""
    out: dict[str, np.ndarray] = {}

    def conv_bn(up, us, ours, seq, idx):
        _conv2d(out, f"{seq}.{idx}", up[f"{ours}_conv"])
        _bn(out, f"{seq}.{idx + 1}", up[f"{ours}_bn"], us[f"{ours}_bn"])

    units = sorted(
        (k for k in params if k.startswith("stage")),
        key=lambda k: (int(k[len("stage"):k.index("_")]),
                       int(k.split("unit")[1])))
    for unit_idx, name in enumerate(units):
        up, us = params[name], stats[name]
        ref = f"{prefix}{unit_idx}"
        if "l_dw_conv" in up:  # stride-2 unit
            conv_bn(up, us, "l_dw", f"{ref}.banch1", 0)
            conv_bn(up, us, "l_pw", f"{ref}.banch1", 2)
            conv_bn(up, us, "r_pw1", f"{ref}.banch2", 0)
            conv_bn(up, us, "r_dw", f"{ref}.banch2", 3)
            conv_bn(up, us, "r_pw2", f"{ref}.banch2", 5)
        else:
            conv_bn(up, us, "pw1", f"{ref}.banch2", 0)
            conv_bn(up, us, "dw", f"{ref}.banch2", 3)
            conv_bn(up, us, "pw2", f"{ref}.banch2", 5)
    if "conv_last_conv" in params:
        last = (prefix.rsplit(".", 2)[0] + ".1" if prefix.endswith("0.")
                else "conv_last")
        _conv2d(out, f"{last}.0", params["conv_last_conv"])
        _bn(out, f"{last}.1", params["conv_last_bn"], stats["conv_last_bn"])
    return out


def _export_tcn(params: Mapping[str, Any], stats: Mapping[str, Any],
                out: dict) -> None:
    """Inverse of ``torch_import._import_tcn`` (multibranch
    ``tcn.mb_ms_tcn.network.*`` / single-branch ``tcn.tcn_trunk.network.*``)."""
    blocks = sorted((k for k in params if k.startswith("block")),
                    key=lambda k: int(k[len("block"):]))
    if not blocks:
        return
    multibranch = any(k.startswith("cbcr") for k in params[blocks[0]])
    net = "tcn.mb_ms_tcn.network" if multibranch else "tcn.tcn_trunk.network"
    for bname in blocks:
        bp, bs = params[bname], stats.get(bname, {})
        level = int(bname[len("block"):])
        ref = f"{net}.{level}"
        if multibranch:
            for cname in sorted(k for k in bp if k.startswith("cbcr")):
                cp = bp[cname]
                cref = f"{ref}.{cname}"
                _conv1d(out, f"{cref}.conv", cp["conv"])
                _bn(out, f"{cref}.batchnorm", cp["bn"], bs[cname]["bn"])
                if "act" in cp:
                    out[f"{cref}.non_lin.weight"] = _np(cp["act"]["alpha"])
            if "downsample" in bp:
                _conv1d(out, f"{ref}.downsample", bp["downsample"])
            if "relu_final" in bp:
                out[f"{ref}.relu_final.weight"] = _np(bp["relu_final"]["alpha"])
        else:
            for i in (1, 2):
                cp = bp[f"conv{i}"]
                _conv1d(out, f"{ref}.conv{i}", cp["conv"])
                _bn(out, f"{ref}.batchnorm{i}", cp["bn"], bs[f"conv{i}"]["bn"])
                if "act" in cp:
                    out[f"{ref}.relu{i}.weight"] = _np(cp["act"]["alpha"])
            if "downsample" in bp:
                _conv1d(out, f"{ref}.downsample", bp["downsample"])
            if "relu" in bp:
                out[f"{ref}.relu.weight"] = _np(bp["relu"]["alpha"])


def export_lipreading_state_dict(
    params: Mapping[str, Any], batch_stats: Mapping[str, Any],
    data_parallel_prefix: bool = False,
) -> dict[str, np.ndarray]:
    """Our ``models.lipreading.Lipreading`` tree (ResNet trunk) -> the
    reference ``Lipreading`` state_dict layout
    (``models/video_models/model.py``: ``frontend3D.{0,1,2}``,
    ``trunk.layer{s}.{i}.*``, ``tcn.*``, ``tcn.tcn_output``)."""
    out: dict[str, np.ndarray] = {}
    # flax Conv3D (D, H, W, I, O) -> torch Conv3d (O, I, D, H, W)
    out["frontend3D.0.weight"] = np.ascontiguousarray(
        np.transpose(_np(params["frontend_conv"]["kernel"]), (4, 3, 0, 1, 2)))
    _bn(out, "frontend3D.1", params["frontend_bn"],
        batch_stats["frontend_bn"])
    if "frontend_prelu" in params:
        out["frontend3D.2.weight"] = _np(params["frontend_prelu"]["alpha"])

    trunk_p = params.get("trunk", {})
    trunk_s = batch_stats.get("trunk", {})
    if any(k.startswith("stage") or k.startswith("conv_last") for k in trunk_p):
        out.update(export_shufflenet_trunk_state_dict(trunk_p, trunk_s))
        trunk_p = {}
    for name, bp in trunk_p.items():
        if not name.startswith("layer"):
            raise ValueError(
                f"unsupported trunk entry {name!r}: expected the ResNet "
                "(layer{s}_block{i}) or ShuffleNetV2 (stage{s}_unit{i}) layout")
        stage, block = name.split("_block")
        ref = f"trunk.{stage}.{int(block)}"
        bs = trunk_s.get(name, {})
        for conv, bnn in (("conv1", "bn1"), ("conv2", "bn2")):
            _conv2d(out, f"{ref}.{conv}", bp[conv])
            _bn(out, f"{ref}.{bnn}", bp[bnn], bs[bnn])
        for relu in ("relu1", "relu2"):
            if relu in bp:
                out[f"{ref}.{relu}.weight"] = _np(bp[relu]["alpha"])
        if "down_conv" in bp:
            _conv2d(out, f"{ref}.downsample.0", bp["down_conv"])
            _bn(out, f"{ref}.downsample.1", bp["down_bn"], bs["down_bn"])

    if "tcn" in params:
        _export_tcn(params["tcn"], batch_stats.get("tcn", {}), out)
    if "tcn_output" in params:
        _dense(out, "tcn.tcn_output", params["tcn_output"])
    return _apply_prefix(out, data_parallel_prefix)


# ---------------------------------------------------------------------------
# .pth savers (require torch)
# ---------------------------------------------------------------------------

def _to_torch(sd: Mapping[str, np.ndarray]):
    import torch

    # copy=True: jax array buffers are non-writable, and torch tensors must
    # own writable memory (from_numpy on a read-only view warns and yields
    # undefined behavior on write)
    return {k: torch.from_numpy(np.array(v, copy=True)) for k, v in sd.items()}


def save_reference_audio_checkpoint(
    path: str, params: Mapping[str, Any], batch_stats: Mapping[str, Any],
    epoch: int = 0, criterion_params: Mapping[str, Any] | None = None,
    pooling: str = "attentive_statistic", data_parallel_prefix: bool = False,
) -> None:
    """Write a reference-format audio ``net_<epoch>.pth``
    (``train_audio.py:261-264`` container; see module docstring for the
    ``criterion``/``optimizer`` deviations)."""
    import torch

    sd = export_speaker_embnet_state_dict(
        params, batch_stats, pooling=pooling,
        data_parallel_prefix=data_parallel_prefix)
    ckpt: dict[str, Any] = {
        "epoch": int(epoch), "state_dict": _to_torch(sd), "optimizer": {},
    }
    if criterion_params is not None:
        crit = export_criterion_state_dict(criterion_params)
        if crit is not None:
            ckpt["criterion_state_dict"] = _to_torch(crit)
    torch.save(ckpt, path)


def save_reference_video_checkpoint(
    path: str, params: Mapping[str, Any], batch_stats: Mapping[str, Any],
    data_parallel_prefix: bool = False,
) -> None:
    """Write a reference-format video checkpoint — the raw ``state_dict``
    (``train_video.py:169``)."""
    import torch

    sd = export_lipreading_state_dict(
        params, batch_stats, data_parallel_prefix=data_parallel_prefix)
    torch.save(_to_torch(sd), path)


def save_reference_fusion_checkpoint(
    path: str, head_params: Mapping[str, Any], epoch: int = 0,
    criterion_params: Mapping[str, Any] | None = None,
    data_parallel_prefix: bool = False,
) -> None:
    """Write a reference-format fusion ``net_<epoch>.pth``
    (``train_fusion.py:176-179`` container: LowFER U/V state_dict)."""
    import torch

    sd = _apply_prefix(export_lowfer_state_dict(head_params),
                       data_parallel_prefix)
    ckpt: dict[str, Any] = {
        "epoch": int(epoch), "state_dict": _to_torch(sd), "optimizer": {},
    }
    if criterion_params is not None:
        crit = export_criterion_state_dict(criterion_params)
        if crit is not None:
            ckpt["criterion_state_dict"] = _to_torch(crit)
    torch.save(ckpt, path)

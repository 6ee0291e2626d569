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


def _to_numpy(v, float_dtype=np.float32) -> np.ndarray:
    arr = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
    # params are always float32 in this framework (CLAUDE.md): fp16/bf16
    # checkpoints would silently fail the 1e-4 embedding-parity bar.
    # float_dtype=np.float64 keeps doubles (train-parity harness only).
    # The result must NEVER share memory with the torch tensor: .numpy()
    # aliases it, and on the CPU backend jax.device_put can alias a numpy
    # buffer zero-copy — a torch optimizer stepping the live module
    # afterwards would silently mutate the imported jax params (caught by
    # the train-parity harness). astype() already returns a fresh buffer,
    # so only the same-dtype path needs an explicit copy.
    if np.issubdtype(arr.dtype, np.floating) and arr.dtype != float_dtype:
        return arr.astype(float_dtype)
    return np.array(arr, copy=True)


def _clean_state_dict(
    state_dict: Mapping[str, Any], float_dtype=np.float32
) -> dict[str, np.ndarray]:
    out = {}
    for k, v in state_dict.items():
        # strip the DataParallel prefix only — replace() would clobber a
        # submodule literally named 'module' anywhere in the key
        if k.startswith("module."):
            k = k[len("module."):]
        if k.startswith("fc3") or k.endswith("num_batches_tracked"):
            continue
        out[k] = _to_numpy(v, float_dtype)
    return out


def import_speaker_embnet_state_dict(
    state_dict: Mapping[str, Any], n_blocks: int, float_dtype=np.float32
) -> tuple[dict, dict]:
    """Returns ``(params, batch_stats)`` for ``models.tdnn.SpeakerEmbNet``."""
    sd = _clean_state_dict(state_dict, float_dtype)
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

    # attentive pooling parameters, when present. AttentiveStatPooling stores
    # 2-D tensors matching ours directly (pooling.py:79-82); MonoHeadAttention
    # stores them with a leading broadcast axis (W (1,H,C), b (1,H,1),
    # v (1,1,H), k (1,1,1) — pooling.py:34-37) which maps by squeeze/reshape.
    pool = {}
    for pname in ("W", "b", "v", "k"):
        key = f"pooling.{pname}"
        if key not in sd:
            continue
        t = sd[key]
        if t.ndim == 3:  # mono-head layout
            if pname == "W":
                t = t[0]  # (H, C)
            elif pname == "b":
                t = t.reshape(-1, 1)  # (H, 1)
            elif pname == "v":
                t = t.reshape(1, -1)  # (1, H)
            else:
                t = t.reshape(1, 1)
        pool[pname] = t
    if pool:
        params["pool"] = pool

    return params, stats


def import_lmcl_state_dict(state_dict: Mapping[str, Any],
                           float_dtype=np.float32) -> dict:
    """LMCL criterion weights (``loss.py:40``) -> our LMCL params."""
    sd = _clean_state_dict(state_dict, float_dtype)
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
    state_dict: Mapping[str, Any], layers: tuple[int, ...] = (2, 2, 2, 2),
    float_dtype=np.float32,
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
    sd = _clean_state_dict(state_dict, float_dtype)
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

    tcn_p, tcn_s = _import_tcn(sd)
    if tcn_p:
        params["tcn"] = tcn_p
        stats["tcn"] = tcn_s
    if "tcn.tcn_output.weight" in sd:
        params["tcn_output"] = {
            "kernel": sd["tcn.tcn_output.weight"].T,
            "bias": sd["tcn.tcn_output.bias"],
        }
    return params, stats


def _import_tcn(sd: Mapping[str, np.ndarray]) -> tuple[dict, dict]:
    """TCN head weights (multibranch ``tcn.mb_ms_tcn.network.*`` or
    single-branch ``tcn.tcn_trunk.network.*``) -> our TCN param tree.

    The reference's pad-then-chomp convs and our centered SAME convs share
    identical weight layouts (see ``models/tcn.py``), so Conv1d OIK maps to
    KIO directly. Covers ConvBatchChompRelu (conv/batchnorm/non_lin) for the
    multibranch path and TemporalBlock (convN/batchnormN/reluN) for the
    single-branch path, plus downsample and final PReLU.
    """
    params: dict[str, Any] = {}
    stats: dict[str, Any] = {}

    def conv1d(prefix):
        out = {"kernel": np.transpose(sd[f"{prefix}.weight"], (2, 1, 0))}
        if f"{prefix}.bias" in sd:
            out["bias"] = sd[f"{prefix}.bias"]
        return out

    def bn(prefix):
        return (
            {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]},
            {"mean": sd[f"{prefix}.running_mean"], "var": sd[f"{prefix}.running_var"]},
        )

    # ---- multibranch: tcn.mb_ms_tcn.network.{L}.cbcr{0,1}_{k} ----------
    level = 0
    while f"tcn.mb_ms_tcn.network.{level}.cbcr0_0.conv.weight" in sd:
        ref = f"tcn.mb_ms_tcn.network.{level}"
        bp: dict[str, Any] = {}
        bs: dict[str, Any] = {}
        for layer in (0, 1):
            k_idx = 0
            while f"{ref}.cbcr{layer}_{k_idx}.conv.weight" in sd:
                cref = f"{ref}.cbcr{layer}_{k_idx}"
                cp: dict[str, Any] = {"conv": conv1d(f"{cref}.conv")}
                p, s = bn(f"{cref}.batchnorm")
                cp["bn"] = p
                if f"{cref}.non_lin.weight" in sd:
                    cp["act"] = {"alpha": sd[f"{cref}.non_lin.weight"]}
                bp[f"cbcr{layer}_{k_idx}"] = cp
                bs[f"cbcr{layer}_{k_idx}"] = {"bn": s}
                k_idx += 1
        if f"{ref}.downsample.weight" in sd:
            bp["downsample"] = conv1d(f"{ref}.downsample")
        if f"{ref}.relu_final.weight" in sd:
            bp["relu_final"] = {"alpha": sd[f"{ref}.relu_final.weight"]}
        params[f"block{level}"] = bp
        stats[f"block{level}"] = bs
        level += 1

    # ---- single-branch: tcn.tcn_trunk.network.{L}.conv{1,2} ------------
    level = 0
    while f"tcn.tcn_trunk.network.{level}.conv1.weight" in sd:
        ref = f"tcn.tcn_trunk.network.{level}"
        bp = {}
        bs = {}
        for i in (1, 2):
            cp = {"conv": conv1d(f"{ref}.conv{i}")}
            p, s = bn(f"{ref}.batchnorm{i}")
            cp["bn"] = p
            if f"{ref}.relu{i}.weight" in sd:
                cp["act"] = {"alpha": sd[f"{ref}.relu{i}.weight"]}
            bp[f"conv{i}"] = cp
            bs[f"conv{i}"] = {"bn": s}
        if f"{ref}.downsample.weight" in sd:
            bp["downsample"] = conv1d(f"{ref}.downsample")
        if f"{ref}.relu.weight" in sd:
            bp["relu"] = {"alpha": sd[f"{ref}.relu.weight"]}
        params[f"block{level}"] = bp
        stats[f"block{level}"] = bs
        level += 1

    return params, stats


def import_shufflenet_trunk_state_dict(
    sd_or_raw: Mapping[str, Any], prefix: str = "trunk.0."
) -> tuple[dict, dict]:
    """Reference ShuffleNetV2 trunk weights -> our ShuffleNetV2Trunk tree.

    The reference wires ``Sequential(features, conv_last, globalpool)`` as
    the Lipreading trunk (``model.py:75``), so keys look like
    ``trunk.0.<unit>.banch{1,2}.<idx>.*`` (InvertedResidual sequentials,
    ``shufflenetv2.py:52-89``) and ``trunk.1.{0,1}.*`` (conv_1x1_bn). Unit
    layouts: stride-1 ``banch2`` = pw/bn/relu/dw/bn/pw/bn/relu; stride-2
    adds ``banch1`` = dw/bn/pw/bn/relu. Mapping onto our unit names:
    pw1/dw/pw2 (stride 1) and l_dw/l_pw/r_pw1/r_dw/r_pw2 (stride 2).
    """
    sd = _clean_state_dict(sd_or_raw)
    params: dict[str, Any] = {}
    stats: dict[str, Any] = {}

    def conv(key):
        return {"kernel": np.transpose(sd[key], (2, 3, 1, 0))}

    def bn(key_prefix):
        return (
            {"scale": sd[f"{key_prefix}.weight"], "bias": sd[f"{key_prefix}.bias"]},
            {"mean": sd[f"{key_prefix}.running_mean"],
             "var": sd[f"{key_prefix}.running_var"]},
        )

    def conv_bn(ref, ours, up, us):
        up[f"{ours}_conv"] = conv(f"{ref}.weight")
        p, s = bn(ref.rsplit(".", 1)[0] + "." + str(int(ref.rsplit(".", 1)[1]) + 1))
        up[f"{ours}_bn"] = p
        us[f"{ours}_bn"] = s

    stage_repeats = (4, 8, 4)
    unit = 0
    for stage, reps in enumerate(stage_repeats, start=2):
        for i in range(reps):
            ref = f"{prefix}{unit}"
            name = f"stage{stage}_unit{i}"
            up: dict[str, Any] = {}
            us: dict[str, Any] = {}
            if f"{ref}.banch1.0.weight" in sd:  # stride-2 unit
                conv_bn(f"{ref}.banch1.0", "l_dw", up, us)
                conv_bn(f"{ref}.banch1.2", "l_pw", up, us)
                conv_bn(f"{ref}.banch2.0", "r_pw1", up, us)
                conv_bn(f"{ref}.banch2.3", "r_dw", up, us)
                conv_bn(f"{ref}.banch2.5", "r_pw2", up, us)
            else:  # stride-1 unit
                conv_bn(f"{ref}.banch2.0", "pw1", up, us)
                conv_bn(f"{ref}.banch2.3", "dw", up, us)
                conv_bn(f"{ref}.banch2.5", "pw2", up, us)
            params[name] = up
            stats[name] = us
            unit += 1

    # conv_last (trunk.1 = conv_1x1_bn)
    last_prefix = prefix.rsplit(".", 2)[0] + ".1" if prefix.endswith("0.") else "conv_last"
    if f"{last_prefix}.0.weight" in sd:
        params["conv_last_conv"] = conv(f"{last_prefix}.0.weight")
        p, s = bn(f"{last_prefix}.1")
        params["conv_last_bn"] = p
        stats["conv_last_bn"] = s
    return params, stats


def load_reference_video_checkpoint(path: str, layers=(2, 2, 2, 2)) -> tuple[dict, dict]:
    """torch.load a reference video ``state_dict`` file and convert."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state_dict = ckpt.get("state_dict", ckpt)
    return import_lipreading_state_dict(state_dict, layers)


# ---------------------------------------------------------------------------
# fusion head (LowFER) + criterion import
# ---------------------------------------------------------------------------

def import_lowfer_state_dict(state_dict: Mapping[str, Any],
                             float_dtype=np.float32) -> dict:
    """Reference ``LowFER`` weights (``LBP.py:12-15``: U, V) -> our params."""
    sd = _clean_state_dict(state_dict, float_dtype)
    return {"U": sd["U"], "V": sd["V"]}


def import_criterion_state_dict(state_dict: Mapping[str, Any],
                                float_dtype=np.float32) -> dict | None:
    """Criterion weights -> our criterion params.

    Handles both reference criterion families (``loss.py``): CrossEntropy
    (``fc.weight``/``fc.bias`` -> Dense kernel/bias) and LMCL
    (``weights``). Returns None for an empty/unrecognized state dict.
    """
    sd = _clean_state_dict(state_dict, float_dtype)
    if "fc.weight" in sd:
        out = {"fc": {"kernel": np.ascontiguousarray(sd["fc.weight"].T)}}
        if "fc.bias" in sd:
            out["fc"]["bias"] = sd["fc.bias"]
        return out
    if "weights" in sd:
        return import_lmcl_state_dict(state_dict, float_dtype)
    return None


def _tolerant_torch_load(path: str):
    """torch.load that survives unpicklable classes.

    Reference fusion checkpoints embed the WHOLE criterion module object
    (``train_fusion.py:177-179`` pickles ``self.criterion``), whose class
    lives in the reference package — absent here, a plain ``torch.load``
    raises ModuleNotFoundError before any tensor is read. Substitute
    unknown classes with attribute-bag stubs so the tensors (and any
    ``_parameters`` dicts inside stubbed modules) are still recovered.
    """
    import pickle
    import types

    import torch

    class _Stub:
        def __setstate__(self, state):
            if isinstance(state, dict):
                self.__dict__.update(state)
            else:
                self.__dict__["_state"] = state

    class _Unpickler(pickle.Unpickler):
        def find_class(self, module, name):
            try:
                return super().find_class(module, name)
            except Exception:
                return type(name, (_Stub,), {"__module__": module})

    shim = types.ModuleType("deeplip_tolerant_pickle")
    shim.Unpickler = _Unpickler
    shim.Pickler = pickle.Pickler
    shim.load = pickle.load
    return torch.load(path, map_location="cpu", weights_only=False,
                      pickle_module=shim)


def _criterion_state_from_object(obj) -> dict:
    """Best-effort ``state_dict()`` from a real or stubbed torch module."""
    if hasattr(obj, "state_dict"):
        try:
            return dict(obj.state_dict())
        except Exception:
            pass
    # stubbed nn.Module: walk _parameters/_buffers/_modules by hand
    out: dict[str, Any] = {}

    def walk(node, prefix=""):
        d = getattr(node, "__dict__", {})
        for k, v in (d.get("_parameters") or {}).items():
            if v is not None:
                out[prefix + k] = v
        for k, v in (d.get("_buffers") or {}).items():
            if v is not None and "running" not in k:
                out[prefix + k] = v
        for k, v in (d.get("_modules") or {}).items():
            if v is not None:
                walk(v, prefix + k + ".")

    walk(obj)
    return out


def load_reference_fusion_checkpoint(
    path: str, float_dtype=np.float32,
) -> tuple[dict, dict | None]:
    """torch.load a reference fusion ``net_*.pth`` / ``net_avg.pth``
    (``train_fusion.py:177-179``: ``state_dict`` = LowFER U/V,
    ``criterion`` = the pickled criterion module) and convert.

    Returns ``(head_params, criterion_params_or_None)``. The criterion
    object is recovered even when its class can't be imported (see
    :func:`_tolerant_torch_load`); if its weights can't be identified,
    ``None`` is returned and the caller keeps its initialized criterion.
    """
    import torch

    try:
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
    except Exception:
        ckpt = _tolerant_torch_load(path)
    head = import_lowfer_state_dict(ckpt.get("state_dict", ckpt), float_dtype)
    crit_params = None
    if isinstance(ckpt, dict) and ckpt.get("criterion_state_dict") is not None:
        # our own torch_export container: criterion weights as a plain dict
        return head, import_criterion_state_dict(
            ckpt["criterion_state_dict"], float_dtype)
    crit = ckpt.get("criterion") if isinstance(ckpt, dict) else None
    if crit is not None:
        try:
            crit_params = import_criterion_state_dict(
                _criterion_state_from_object(crit), float_dtype)
        except Exception:
            crit_params = None
    return head, crit_params

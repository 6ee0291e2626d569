"""Configuration tree for deeplip_tpu.

The reference drives everything from three config files — a nested YAML for
audio (``conf/audio_config.yaml``, loaded at ``train_audio.py:34-40``), a JSON
for video (``conf/video_config.json`` via ``train_video.py:174``), and a nested
YAML for fusion (``conf/fusion_config.yaml`` via ``train_fusion.py:38-44``) —
plus an ``Args`` flattener (``models/audio_models/utils.py:144-174``).

Here a single :class:`Config` wrapper gives attribute *and* item access over
arbitrarily nested dicts, loads the same YAML/JSON layouts, and provides the
same flattening used by the reference's ``Args`` class. Unlike the reference,
no path is hard-coded: every dataset/experiment path comes from the config.
"""

from __future__ import annotations

import json
import copy
from collections import OrderedDict
from typing import Any, Mapping

import yaml


class Config(dict):
    """A dict with attribute access, recursive wrapping, and flattening.

    >>> c = Config({"model": {"arch": "etdnn"}})
    >>> c.model.arch
    'etdnn'
    """

    def __init__(self, data: Mapping[str, Any] | None = None, **kw: Any):
        super().__init__()
        merged = dict(data or {})
        merged.update(kw)
        for k, v in merged.items():
            self[k] = v

    @staticmethod
    def _wrap(value: Any) -> Any:
        if isinstance(value, Config):
            return value
        if isinstance(value, Mapping):
            return Config(value)
        if isinstance(value, (list, tuple)):
            return type(value)(Config._wrap(v) for v in value)
        return value

    def __setitem__(self, key: str, value: Any) -> None:
        super().__setitem__(key, Config._wrap(value))

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:  # pragma: no cover - error path
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def __deepcopy__(self, memo):  # keep Config type through deepcopy
        return Config({k: copy.deepcopy(v, memo) for k, v in self.items()})

    # ---- reference-compatible flattening -------------------------------
    def flatten(self) -> "OrderedDict[str, Any]":
        """Flatten one level of selected-subsection indirection.

        Mirrors ``Args.parse_opts`` (``models/audio_models/utils.py:157-165``):
        scalar entries are kept; if the *value* of some entry names a sibling
        key (e.g. ``feat_type: mfcc`` next to an ``mfcc:`` sub-dict), that
        sub-dict's entries are hoisted to the top level.
        """
        out: "OrderedDict[str, Any]" = OrderedDict()
        values = list(self.values())
        for key, val in self.items():
            if key in values and isinstance(self.get(key), Mapping):
                for k, v in self[key].items():
                    out[k] = v
            if not isinstance(val, Mapping):
                out[key] = val
        return out

    def to_dict(self) -> dict:
        def unwrap(v: Any) -> Any:
            if isinstance(v, Mapping):
                return {k: unwrap(x) for k, x in v.items()}
            if isinstance(v, (list, tuple)):
                return [unwrap(x) for x in v]
            return v

        return unwrap(self)

    def merged(self, other: Mapping[str, Any]) -> "Config":
        """Deep merge ``other`` over ``self`` and return a new Config."""
        out = copy.deepcopy(self)

        def rec(dst: Config, src: Mapping[str, Any]) -> None:
            for k, v in src.items():
                if isinstance(v, Mapping) and isinstance(dst.get(k), Mapping):
                    rec(dst[k], v)
                else:
                    dst[k] = v

        rec(out, other)
        return out


def load_config(path: str) -> Config:
    """Load a YAML (.yaml/.yml) or JSON (.json) config file."""
    with open(path, "r") as f:
        if path.endswith(".json"):
            data = json.load(f)
        else:
            data = yaml.safe_load(f)
    return Config(data)


def load_audio_config(path: str) -> Config:
    """Load the audio config: nested {data, model, train, test} YAML.

    Layout mirrors ``conf/audio_config.yaml`` in the reference.
    """
    cfg = load_config(path)
    _ensure_sections(cfg)
    return cfg


def _ensure_sections(cfg: Config) -> None:
    """Missing OR empty-None sections (yaml parses a bare 'test:' header as
    None, which setdefault would keep) become empty Configs."""
    for section in ("data", "model", "train", "test"):
        if cfg.get(section) is None:
            cfg[section] = Config()


def load_video_config(path: str) -> Config:
    """Load the video model config (flat JSON per ``conf/video_config.json``)."""
    return load_config(path)


def load_fusion_config(path: str) -> Config:
    """Load the fusion config: nested YAML with audio/video sub-configs
    (mirrors ``conf/fusion_config.yaml``)."""
    cfg = load_config(path)
    _ensure_sections(cfg)
    return cfg

"""Import the reference's own torch modules for numeric parity cross-checks.

The reference (/root/reference, read-only) needs two packages absent from this
sandbox: ``timm`` (only ``Mlp``/``DropPath``/``to_2tuple``/``to_ntuple`` from
``timm.models.layers`` — reference models/fusion.py:7) and ``omegaconf``
(``DictConfig``, imported for type annotations only).  This module installs
minimal functional shims into ``sys.modules`` and appends the reference root
to ``sys.path`` so ``models.fusion``, ``models.decoder``,
``models.pointdsc.PointDSC``, ``losses`` and ``bop_toolkit_lib.pose_error``
import unmodified.

The shims replicate the documented behavior of the real packages at EVAL time
(DropPath is identity; the oryon configs use drop rates of 0 everywhere), so
forward passes through the reference code are exactly what the reference
would compute.
"""
from __future__ import annotations

import collections.abc
import importlib
import sys
import types
from itertools import repeat as _repeat

REFERENCE_ROOT = "/root/reference"


def _ntuple(n):
    def parse(x):
        if isinstance(x, collections.abc.Iterable) and not isinstance(x, str):
            return tuple(x)
        return tuple(_repeat(x, n))
    return parse


def install_shims() -> None:
    if "timm" not in sys.modules:
        import torch.nn as nn

        class Mlp(nn.Module):
            """timm.layers.Mlp: fc1 -> act -> drop -> fc2 -> drop."""

            def __init__(self, in_features, hidden_features=None,
                         out_features=None, act_layer=nn.GELU, bias=True,
                         drop=0.0):
                super().__init__()
                out_features = out_features or in_features
                hidden_features = hidden_features or in_features
                self.fc1 = nn.Linear(in_features, hidden_features, bias=bias)
                self.act = act_layer()
                self.drop1 = nn.Dropout(drop)
                self.fc2 = nn.Linear(hidden_features, out_features, bias=bias)
                self.drop2 = nn.Dropout(drop)

            def forward(self, x):
                return self.drop2(self.fc2(self.drop1(self.act(self.fc1(x)))))

        class DropPath(nn.Module):
            """Stochastic depth — identity at eval / drop_prob 0 (the only
            configuration the reference instantiates, fusion.py:145)."""

            def __init__(self, drop_prob=0.0):
                super().__init__()
                self.drop_prob = drop_prob

            def forward(self, x):
                if self.training and self.drop_prob > 0.0:
                    raise NotImplementedError(
                        "shim DropPath only supports eval / p=0")
                return x

        timm = types.ModuleType("timm")
        timm_models = types.ModuleType("timm.models")
        layers = types.ModuleType("timm.models.layers")
        layers.Mlp = Mlp
        layers.DropPath = DropPath
        layers.to_2tuple = _ntuple(2)
        layers.to_ntuple = _ntuple
        timm.models = timm_models
        timm_models.layers = layers
        sys.modules["timm"] = timm
        sys.modules["timm.models"] = timm_models
        sys.modules["timm.models.layers"] = layers

    if "omegaconf" not in sys.modules:
        om = types.ModuleType("omegaconf")

        class DictConfig(dict):
            """Attribute-access dict, enough for the reference's type hints
            and cfg.attr reads."""

            def __getattr__(self, k):
                try:
                    v = self[k]
                except KeyError as e:
                    raise AttributeError(k) from e
                return DictConfig(v) if isinstance(v, dict) else v

        om.DictConfig = DictConfig
        om.OmegaConf = types.SimpleNamespace(
            create=lambda d=None: DictConfig(d or {}))
        om.ListConfig = list

        class _OpenDict:
            def __init__(self, cfg):
                self.cfg = cfg

            def __enter__(self):
                return self.cfg

            def __exit__(self, *a):
                return False

        om.open_dict = _OpenDict
        sys.modules["omegaconf"] = om

    try:
        import pytz  # noqa: F401  — real package wins if present
        _need_pytz = False
    except ImportError:
        _need_pytz = "pytz" not in sys.modules
    if _need_pytz:
        # fully initialize pandas BEFORE the fake pytz lands in sys.modules:
        # pandas probes for pytz during init and a minimal shim sends it
        # down a broken code path (circular-import AttributeError)
        try:
            import pandas  # noqa: F401
        except ImportError:
            pass
        import datetime as _dt

        pytz = types.ModuleType("pytz")

        class _Utc(_dt.tzinfo):
            def utcoffset(self, dt):
                return _dt.timedelta(0)

            def dst(self, dt):
                return _dt.timedelta(0)

            def localize(self, dt):
                return dt.replace(tzinfo=self)

        pytz.utc = _Utc()
        pytz.timezone = lambda name: pytz.utc
        sys.modules["pytz"] = pytz

    if "ftfy" not in sys.modules:
        # reference models/tokenizer.py:7 imports ftfy for mojibake repair;
        # identity is exact for the clean ASCII/UTF-8 strings the parity
        # tests feed (the repo tokenizer treats absent ftfy the same way)
        ftfy = types.ModuleType("ftfy")
        ftfy.fix_text = lambda s: s
        sys.modules["ftfy"] = ftfy

    if "easydict" not in sys.modules:
        ed = types.ModuleType("easydict")

        class EasyDict(dict):
            def __getattr__(self, k):
                try:
                    return self[k]
                except KeyError as e:
                    raise AttributeError(k) from e

        ed.EasyDict = EasyDict
        sys.modules["easydict"] = ed


def ref_import(name: str):
    """Import a module from the reference tree (e.g. 'models.fusion')."""
    install_shims()
    if REFERENCE_ROOT not in sys.path:
        # append (not prepend) so repo modules always win name lookups
        sys.path.append(REFERENCE_ROOT)
    return importlib.import_module(name)


def ref_import_with_stubs(name: str, stubs: dict):
    """Import a reference module whose import-time deps we don't need.

    ``stubs`` maps module names to stand-in module objects that are placed in
    sys.modules ONLY for the duration of this import (the previous binding —
    e.g. HuggingFace ``datasets`` shadowing the reference's datasets.py — is
    restored afterwards; the imported module keeps its references)."""
    install_shims()
    if REFERENCE_ROOT not in sys.path:
        sys.path.append(REFERENCE_ROOT)
    saved = {}
    for k, v in stubs.items():
        saved[k] = sys.modules.get(k)
        sys.modules[k] = v
    try:
        sys.modules.pop(name, None)
        return importlib.import_module(name)
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


def cfg_ns(d):
    """Recursive attribute-namespace for reference args objects."""
    ns = types.SimpleNamespace()
    for k, v in d.items():
        setattr(ns, k, cfg_ns(v) if isinstance(v, dict) else v)
    return ns

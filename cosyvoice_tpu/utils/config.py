"""Declarative JSON configs → model config dataclasses.

The reference's hyperpyyaml object graph (SURVEY §5.6,
examples/libritts/cosyvoice2/conf/cosyvoice2.yaml:23-207) instantiates
nn.Modules directly from yaml. The TPU-native replacement keeps configs
declarative: a plain JSON dict with sections {"llm": {...}, "flow": {...},
"hift": {...}, "train": {...}} whose keys are dataclass fields. Nested
dataclasses (qwen / estimator / cfm / dit) nest as dicts; dtypes are
strings ("bfloat16"); lists become tuples.

Used by bin/train.py (--config), the recipes under examples/, and the
public API when a model dir carries a config.json.
"""

import dataclasses
import json
from typing import Any, Dict, Optional

import jax.numpy as jnp

_DTYPES = {
    "bfloat16": jnp.bfloat16,
    "bf16": jnp.bfloat16,
    "float32": jnp.float32,
    "fp32": jnp.float32,
    "float16": jnp.float16,
    "fp16": jnp.float16,
    None: None,
    "": None,
}


def _coerce(field: dataclasses.Field, value: Any) -> Any:
    if field.name == "dtype" or field.type in ("Any", "object"):
        if isinstance(value, str) or value is None:
            return _DTYPES[value]
        return value
    if isinstance(value, list):
        return tuple(tuple(v) if isinstance(v, list) else v for v in value)
    return value


def build_dataclass(cls, d: Optional[Dict[str, Any]], **nested):
    """Build dataclass `cls` from dict `d`; `nested` maps a field name to the
    dataclass type used to build it recursively from a sub-dict."""
    d = dict(d or {})
    kwargs = {}
    fields = {f.name: f for f in dataclasses.fields(cls)}
    for key, value in d.items():
        if key not in fields:
            raise ValueError(f"unknown {cls.__name__} field: {key!r} (have {sorted(fields)})")
        if key in nested and isinstance(value, dict):
            kwargs[key] = build_dataclass(nested[key], value)
        else:
            kwargs[key] = _coerce(fields[key], value)
    return cls(**kwargs)


def build_lm_config(d: Optional[Dict[str, Any]] = None):
    from cosyvoice_tpu.models.llm import LMConfig
    from cosyvoice_tpu.models.qwen2 import Qwen2Config

    return build_dataclass(LMConfig, d, qwen=Qwen2Config)


def build_flow_config(d: Optional[Dict[str, Any]] = None):
    from cosyvoice_tpu.models.dit import DiTConfig
    from cosyvoice_tpu.models.flow import FlowConfig
    from cosyvoice_tpu.models.flow_decoder import EstimatorConfig
    from cosyvoice_tpu.models.flow_matching import CFMConfig

    return build_dataclass(FlowConfig, d, estimator=EstimatorConfig, cfm=CFMConfig, dit=DiTConfig)


def build_hift_config(d: Optional[Dict[str, Any]] = None):
    from cosyvoice_tpu.models.hift import HiFTConfig

    return build_dataclass(HiFTConfig, d)


def build_lm_v1_config(d: Optional[Dict[str, Any]] = None):
    from cosyvoice_tpu.models.llm_v1 import LMv1Config

    return build_dataclass(LMv1Config, d)


def build_s3_config(d: Optional[Dict[str, Any]] = None):
    """config.json "frontend": {"s3": {...}} section -> S3TokenizerConfig
    (converted model dirs record the graph-derived config; hermetic/test
    dirs record their tiny config)."""
    from cosyvoice_tpu.models.speech_tokenizer import S3TokenizerConfig

    return build_dataclass(S3TokenizerConfig, d)


def build_flow_v1_config(d: Optional[Dict[str, Any]] = None):
    from cosyvoice_tpu.models.flow_decoder import EstimatorConfig
    from cosyvoice_tpu.models.flow_matching import CFMConfig
    from cosyvoice_tpu.models.flow_v1 import FlowV1Config

    return build_dataclass(FlowV1Config, d, estimator=EstimatorConfig, cfm=CFMConfig)


def load_config(path: str) -> Dict[str, Any]:
    with open(path) as f:
        return json.load(f)


def build_model_configs(cfg: Dict[str, Any]):
    """Full config dict → (lm_cfg, flow_cfg, hift_cfg) for the model version
    named by cfg['version'] (1 | 2 | 3; default 2)."""
    version = int(cfg.get("version", 2))
    if version == 1:
        return (
            build_lm_v1_config(cfg.get("llm")),
            build_flow_v1_config(cfg.get("flow")),
            build_hift_config(cfg.get("hift")),
        )
    return (
        build_lm_config(cfg.get("llm")),
        build_flow_config(cfg.get("flow")),
        build_hift_config(cfg.get("hift")),
    )

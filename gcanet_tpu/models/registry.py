"""Model registry — the TPU-native analogue of the reference's dynamic
``importlib`` model loading (utils/main_utils.py:55-57, trainer_new.py:87-88,
option_new.py:22-25).

``--model_dict`` values map to model builders; reference names are aliased so
existing scripts keep working:

  models.dgcnn-hais-concat-direct-4  -> flagship PrimitiveNet (kpam offsets)
  models.dgcnn-hais-concat-direct-2  -> PrimitiveNet with the dual-attention
                                        offset module (offset_variant='dual')
  models.sppnet                      -> PrimitiveNetSPP baseline
"""

from __future__ import annotations

from typing import Callable, Dict

from gcanet_tpu.config import Config


def _flagship(cfg: Config):
    from gcanet_tpu.models.primitive_net import PrimitiveNet

    return PrimitiveNet(cfg)


def _variant2(cfg: Config):
    from gcanet_tpu.models.primitive_net import PrimitiveNet

    return PrimitiveNet(cfg.replace(offset_variant="dual"))


def _sppnet(cfg: Config):
    from gcanet_tpu.models.sppnet import PrimitiveNetSPP

    return PrimitiveNetSPP(cfg)


def _softgroup_scene(cfg: Config):
    from gcanet_tpu.models.softgroup_scene import SoftGroupNet

    return SoftGroupNet(cfg, compute_bf16=cfg.scene_bf16,
                        semantic_only=bool(cfg.semantic_only))


def is_scene_model(model_dict: str) -> bool:
    """True when the dotted model name resolves to the scene family (drives
    the SceneTrainer selection in train_new.py)."""
    return _REGISTRY.get(model_dict) is _softgroup_scene


_REGISTRY: Dict[str, Callable] = {
    "gcanet_tpu.models.softgroup_scene": _softgroup_scene,
    "softgroup.model.softgroup": _softgroup_scene,
    "gcanet_tpu.models.primitive_net": _flagship,
    "models.dgcnn-hais-concat-direct-4": _flagship,
    "gcanet_tpu.models.primitive_net_dual": _variant2,
    "models.dgcnn-hais-concat-direct-2": _variant2,
    "gcanet_tpu.models.sppnet": _sppnet,
    "models.sppnet": _sppnet,
}


def build_model(cfg: Config):
    key = cfg.model_dict
    if key not in _REGISTRY:
        raise KeyError(f"unknown model_dict {key!r}; known: {sorted(_REGISTRY)}")
    return _REGISTRY[key](cfg)

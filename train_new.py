"""Train / evaluate the TPU-native GCANet framework.

Public entry point compatible with the reference (``python train_new.py`` to
train, ``python train_new.py --eval`` to test; reference train_new.py:229-232).
"""

from gcanet_tpu.runtime_setup import enable_compilation_cache
from option_new import build_option


def main():
    enable_compilation_cache()
    from gcanet_tpu.parallel.dist import maybe_init_from_env

    maybe_init_from_env()       # multi-host launch via GCA_* env (no-op solo)
    cfg = build_option()
    from gcanet_tpu.models.registry import is_scene_model

    if is_scene_model(cfg.model_dict):
        from gcanet_tpu.train.scene_trainer import SceneTrainer as Trainer
    else:
        from gcanet_tpu.train.trainer import Trainer

    trainer = Trainer(cfg)
    trainer.train()


if __name__ == "__main__":
    main()

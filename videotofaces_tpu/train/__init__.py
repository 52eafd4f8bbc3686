from .trainer import ViTClassifier, create_train_state, make_sharded_train_step  # noqa: F401

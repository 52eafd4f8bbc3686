from .trainer import ViTClassifier, create_train_state, make_sharded_train_step  # noqa: F401
from .triplet import (batch_hard_mining, finetune_facenet,  # noqa: F401
                      make_sharded_triplet_step, triplet_loss)
from .detector import finetune_yolo_head, make_sharded_head_step  # noqa: F401

from .trainer import ViTClassifier, create_train_state, make_sharded_train_step  # noqa: F401
from .triplet import (MemoryBank, batch_hard_mining,  # noqa: F401
                      batch_hard_mining_xbm, finetune_facenet,
                      make_sharded_triplet_step, make_sharded_xbm_step,
                      triplet_loss, triplet_loss_xbm)
from .detector import (finetune_yolo_full, finetune_yolo_head,  # noqa: F401
                       layerwise_tx, make_sharded_full_step,
                       make_sharded_head_step)

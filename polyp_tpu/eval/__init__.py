from polyp_tpu.eval.metrics import (  # noqa: F401
    accuracy_score,
    precision_recall_f1,
    confusion_matrix,
    classification_report,
)
from polyp_tpu.eval.quota import counts_per_class, get_num_images_to_generate  # noqa: F401

from polyp_tpu.data.tables import (  # noqa: F401
    ClassificationTable,
    DiffusionTable,
    AugmentedTable,
    extract_label_from_dir,
)
from polyp_tpu.data.cache import ArrayDataset  # noqa: F401
from polyp_tpu.data.pipeline import Loader, epoch_batches, weighted_sample_weights  # noqa: F401
from polyp_tpu.data.transforms import (  # noqa: F401
    augment_classifier_batch,
    augment_diffusion_batch,
    IMAGENET_MEAN,
    IMAGENET_STD,
)

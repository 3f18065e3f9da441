from polyp_tpu.train.classifier import (  # noqa: F401
    ClassifierState,
    create_classifier_state,
    train_classifier,
    evaluate_classifier,
)

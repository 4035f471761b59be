from radarml_tpu.data.store import (
    load_datasets,
    load_datasets_with_sup_mask,
    save_dataset,
    stack_samples,
    unstack_samples,
)
from radarml_tpu.data.labels import (
    CLASS_ALIAS,
    LabelEncoder,
    apply_aliases,
    class_weights,
    filter_samples,
)
from radarml_tpu.data.balance import balance_classes
from radarml_tpu.data.split import train_val_test_split, train_test_split_indices
from radarml_tpu.data.synthetic import (
    DEFAULT_CLASSES,
    SyntheticTarget,
    make_dataset,
    make_scan_batch,
    synth_cube,
    synth_sample,
)

__all__ = [
    "load_datasets",
    "load_datasets_with_sup_mask",
    "save_dataset",
    "stack_samples",
    "unstack_samples",
    "CLASS_ALIAS",
    "LabelEncoder",
    "apply_aliases",
    "class_weights",
    "filter_samples",
    "balance_classes",
    "train_val_test_split",
    "train_test_split_indices",
    "DEFAULT_CLASSES",
    "SyntheticTarget",
    "make_dataset",
    "make_scan_batch",
    "synth_cube",
    "synth_sample",
]

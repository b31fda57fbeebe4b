from simclr_tpu.data.datasets import (
    load_cifar10,
    load_dataset,
    load_stl10,
    synthetic_dataset,
)
from simclr_tpu.data.pipeline import (
    DeviceDataset,
    Split,
    class_weights,
    epoch_permutation,
    host_stream,
    infinite_stream,
    iterate_epoch,
    iterate_sequential,
    make_split,
    split_indices,
    take_batch,
    weighted_sample_indices,
)

__all__ = [
    "load_cifar10",
    "load_dataset",
    "load_stl10",
    "synthetic_dataset",
    "DeviceDataset",
    "Split",
    "class_weights",
    "epoch_permutation",
    "host_stream",
    "infinite_stream",
    "iterate_epoch",
    "iterate_sequential",
    "make_split",
    "split_indices",
    "take_batch",
    "weighted_sample_indices",
]

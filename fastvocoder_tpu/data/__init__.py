from fastvocoder_tpu.data.dataset import (
    BufferDataset,
    WeightDataset,
    batch_iterator,
    collate,
    crop_item,
    load_data_to_buffer,
    num_batches_per_epoch,
    parse_path_file,
)

__all__ = [
    "BufferDataset",
    "WeightDataset",
    "batch_iterator",
    "collate",
    "crop_item",
    "load_data_to_buffer",
    "num_batches_per_epoch",
    "parse_path_file",
]

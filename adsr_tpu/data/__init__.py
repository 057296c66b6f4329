from adsr_tpu.data.pipeline import SRDataset, EpochSampler, load_sr_dataset
from adsr_tpu.data.prepare import prepare_mvtec_dataset, verify_dataset_structure
from adsr_tpu.data.synthetic import generate_synthetic_mvtec

__all__ = [
    "SRDataset", "EpochSampler", "load_sr_dataset",
    "prepare_mvtec_dataset", "verify_dataset_structure",
    "generate_synthetic_mvtec",
]

from anatomask_tpu.data.dataset import CaseDataset, unpack_dataset
from anatomask_tpu.data.sampler import PatchSampler
from anatomask_tpu.data.pipeline import PrefetchPipeline

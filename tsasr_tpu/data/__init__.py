"""Host-side data layer: manifests, dynamic-item datasets, bucketed
batching, tokenizers, audio IO and on-the-fly mixing.

The TPU-native design point (SURVEY.md §7): the host does only file decode
+ mixing + batch assembly into *bucket-quantized static shapes*; feature
extraction and augmentation happen on device inside the jitted train step.
"""

from tsasr_tpu.data.pipeline import DataPipeline, takes, provides  # noqa: F401
from tsasr_tpu.data.dataset import DynamicItemDataset, add_dynamic_item, set_output_keys  # noqa: F401
from tsasr_tpu.data.batch import PaddedBatch, PaddedData  # noqa: F401
from tsasr_tpu.data.sampler import (  # noqa: F401
    DynamicBatchSampler,
    ReproducibleRandomSampler,
    ReproducibleWeightedRandomSampler,
    DistributedSamplerWrapper,
)
from tsasr_tpu.data.tokenizer import CharTokenizer, train_tokenizer  # noqa: F401
from tsasr_tpu.data.prepare import prepare_librispeechmix  # noqa: F401
from tsasr_tpu.data.loader import SaveableDataLoader, LoopedLoader, make_dataloader  # noqa: F401

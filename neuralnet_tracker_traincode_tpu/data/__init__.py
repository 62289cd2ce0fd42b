"""Host-side data layer: HDF5 storage, batch containers, samplers, loaders."""

from neuralnet_tracker_traincode_tpu.data.fields import (
    FieldCategory,
    imagelike_categories,
    Tag,
    DatasetId,
)
from neuralnet_tracker_traincode_tpu.data.batch import Batch, Metadata

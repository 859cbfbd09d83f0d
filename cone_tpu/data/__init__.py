from cone_tpu.data.store import (
    FeatureStore,
    InMemoryArrayStore,
    PackedArrayStore,
    TextFeatureStore,
    open_array_store,
    write_packed_store,
)
from cone_tpu.data.dataset import GroundingDataset, TrainLoader
from cone_tpu.data.synthetic import make_synthetic_dataset

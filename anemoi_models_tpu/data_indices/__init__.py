from anemoi_models_tpu.data_indices.collection import IndexCollection
from anemoi_models_tpu.data_indices.index import BaseIndex, DataIndex, ModelIndex
from anemoi_models_tpu.data_indices.tensor import BaseTensorIndex, InputTensorIndex, OutputTensorIndex

__all__ = [
    "IndexCollection",
    "BaseIndex",
    "DataIndex",
    "ModelIndex",
    "BaseTensorIndex",
    "InputTensorIndex",
    "OutputTensorIndex",
]

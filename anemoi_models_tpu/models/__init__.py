from anemoi_models_tpu.models.encoder_processor_decoder import AnemoiModelEncProcDec
from anemoi_models_tpu.models.hierarchical import AnemoiModelEncProcDecHierarchical

__all__ = ["AnemoiModelEncProcDec", "AnemoiModelEncProcDecHierarchical"]

from anemoi_models_tpu.models.encoder_processor_decoder import AnemoiModelEncProcDec

__all__ = ["AnemoiModelEncProcDec"]

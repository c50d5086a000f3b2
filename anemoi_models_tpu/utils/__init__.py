from anemoi_models_tpu.utils.config import DotDict, as_dotdict, instantiate, register, resolve_target

__all__ = ["DotDict", "as_dotdict", "instantiate", "register", "resolve_target"]

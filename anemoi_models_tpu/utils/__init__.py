from anemoi_models_tpu.utils.config import DotDict, instantiate, register, resolve_target

__all__ = ["DotDict", "instantiate", "register", "resolve_target"]

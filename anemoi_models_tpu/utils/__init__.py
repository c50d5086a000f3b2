from anemoi_models_tpu.utils.config import DotDict, as_dotdict, instantiate, register, resolve_target
from anemoi_models_tpu.utils.hoist import hoist_constants

__all__ = ["DotDict", "as_dotdict", "instantiate", "register", "resolve_target", "hoist_constants"]

from vri_tpu.usd.usda import Attribute, Prim, parse_usda, write_usda  # noqa: F401
from vri_tpu.usd.stage import Stage  # noqa: F401

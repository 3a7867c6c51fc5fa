from .loinc_i2b2 import transform_loinc_to_i2b2

__all__ = ["transform_loinc_to_i2b2"]

from math_tpu.utils.propto import include_summand, is_autodiff  # noqa: F401

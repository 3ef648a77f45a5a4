from math_tpu.infer.nuts import nuts_kernel, IntegratorState, NutsStats  # noqa: F401
from math_tpu.infer.sample import sample_nuts, ChainResult  # noqa: F401
from math_tpu.infer import adapt  # noqa: F401

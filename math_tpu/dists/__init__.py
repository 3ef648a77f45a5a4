"""Distribution library: ``*_lpdf/_lpmf/_cdf/_lcdf/_lccdf/_rng`` free
functions under their Stan Math names (reference: ``prim/{scal,mat}/prob``).
"""

from math_tpu.dists.continuous import *  # noqa: F401,F403
from math_tpu.dists.discrete import *  # noqa: F401,F403
from math_tpu.dists.multivariate import *  # noqa: F401,F403
from math_tpu.dists.glm import *  # noqa: F401,F403
from math_tpu.dists.more import *  # noqa: F401,F403
from math_tpu.dists.deprecated import *  # noqa: F401,F403

"""Canonical benchmark models (BASELINE.md configs)."""

from math_tpu.models import eight_schools  # noqa: F401

"""quimb_tpu.gen — generation of states, operators and random objects."""

from . import operators, rand, states  # noqa: F401

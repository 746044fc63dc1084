"""LT (Luby transform) fountain codes (reference src/luby.py)."""

from ldpc_decoders_tpu.fountain.lt import (  # noqa: F401
    LTSimulator,
    ideal_soliton,
    robust_soliton,
)

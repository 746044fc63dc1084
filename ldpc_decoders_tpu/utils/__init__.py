"""Host-side utilities: math helpers, registry, file filters, logging."""

from ldpc_decoders_tpu.utils.registry import Registry  # noqa: F401

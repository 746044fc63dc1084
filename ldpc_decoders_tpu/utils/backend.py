"""Backend-error classification.

The axon TPU worker has documented transient-outage windows (it fails
fast with an UNAVAILABLE status for 10-20+ minutes after a client dies
mid-flight, then recovers). Call sites that compile-probe a kernel route
must distinguish that transient state (re-raise / retry — NOT a reason
to silently fall back to a slower route) from genuine kernel
ineligibility (fall back).
"""

from __future__ import annotations

_TRANSIENT_STATUS_PREFIXES = ("UNAVAILABLE", "DEADLINE_EXCEEDED")


def is_transient_backend_error(e: BaseException) -> bool:
    """True when ``e`` is a runtime/backend error carrying a transient
    gRPC-style status (UNAVAILABLE / DEADLINE_EXCEEDED).

    Matched on the exception TYPE (``jax.errors.JaxRuntimeError``, the
    public name of XlaRuntimeError) plus the status prefix the PJRT
    runtime puts at the START of the message — not a substring anywhere
    in the text, so an ineligibility error that merely *mentions* the
    token is not misclassified, and a compile-side Python error that
    quotes a status never matches the wrong way.
    """
    try:
        from jax.errors import JaxRuntimeError
    except Exception:  # pragma: no cover - very old/new jax
        JaxRuntimeError = ()
    if not isinstance(e, JaxRuntimeError):
        return False
    return str(e).lstrip().startswith(_TRANSIENT_STATUS_PREFIXES)

"""Channel models: BEC, BSC, biAWGN.

Each channel module exposes:
- ``send(key, x, param)`` — batched, jit-compatible channel sampling
  with explicit jax.random keys (fixing the reference's global-np.random
  weakness, SURVEY.md section 7 stage 2);
- ``llr(y, param)`` — per-bit log-likelihood-ratio initialisation;
- ``DECODERS`` — name -> factory(code, **kwargs), the duck-typed decoder
  registry the harness resolves by name (mirrors reference main.py:11-12
  ``getattr(model, args.decoder)``).

Registry mirrors reference src/models.py:3.
"""

from ldpc_decoders_tpu.channels import bec, bsc, biawgn

CHANNELS = {"bsc": bsc, "bec": bec, "biawgn": biawgn}

DECODER_NAMES = ["ML", "SPA", "MSA", "LP", "ADMM", "ADMMA"]

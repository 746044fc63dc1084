"""Code construction, file I/O and ensemble generation."""

from ldpc_decoders_tpu.codes.code import (  # noqa: F401
    Code,
    get_code,
    get_code_names,
    load_parity_mtx,
    save_parity_mtx,
    file_codes_dir,
    FILE_CODES_DIR_ENV,
)
from ldpc_decoders_tpu.codes.ensembles import rand_reg_ldpc  # noqa: F401

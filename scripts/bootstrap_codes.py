"""Bootstrap the in-repo `data/codes/` directory.

Makes every campaign runnable from a bare checkout (no reference-checkout
dependency): the same 27-file inventory as the reference's data/codes.
The ensemble member files are VENDORED data fixtures (like margulis):
the reference's committed members are unseeded draws that its committed
golden results correspond to — e.g. rand_ldpc members 2 and 3 each
contain exactly one duplicate-neighborhood variable pair (a 2-element
stopping set), which is what produces their documented BEC WER floors of
~eps^2; a fresh seeded draw cannot reproduce that member-by-member
behavior. Seeded generation remains for the 512-length ensemble (no
goldens reference it) and as the fallback when no reference checkout
exists to vendor from.

  - 1200_3_6_rand_ldpc_{1..10}   vendored fixtures (golden member curves)
  - 1200_rho_x5_rand_ldpc_{1..10} vendored fixtures
  - 512_3_6_rand_ldpc_{1..5}     seeded (512,3,6)-regular draws
  - 1200_3_6_ldpc                fixed draw the reference goldens use
  - margulis                     Margulis (2640,1320) construction

Usage: python scripts/bootstrap_codes.py [--codes_dir data/codes]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VENDORED = (["margulis.txt", "1200_3_6_ldpc.txt"]
            + [f"1200_3_6_rand_ldpc_{i}.txt" for i in range(1, 11)]
            + [f"1200_rho_x5_rand_ldpc_{i}.txt" for i in range(1, 11)])
REF_CODES = "/root/reference/data/codes"


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--codes_dir", default=None)
    args = p.parse_args(argv)

    from ldpc_decoders_tpu.codes import code as code_mod
    from ldpc_decoders_tpu.codes.ensembles import gen_rand_reg_ldpc
    from ldpc_decoders_tpu.design.density_evolution import gen_rand_irg_ldpc

    d = args.codes_dir or code_mod.file_codes_dir()
    os.makedirs(d, exist_ok=True)

    for fname in VENDORED:
        dst = os.path.join(d, fname)
        if os.path.exists(dst):
            H = code_mod.load_parity_mtx(dst)  # parse-validate
            print(f"{fname}: present, {H.shape}")
        elif os.path.exists(os.path.join(REF_CODES, fname)):
            # Vendor once: round-trip through our parser so the committed
            # file is in canonical form (and known to parse).
            H = code_mod.load_parity_mtx(os.path.join(REF_CODES, fname))
            code_mod.save_parity_mtx(H, fname[:-4], d)
            print(f"{fname}: vendored from reference, {H.shape}")
        else:
            print(f"{fname}: MISSING (no reference checkout to vendor from)")

    def fresh(names):
        return [n for n in names if not os.path.exists(
            os.path.join(d, n + ".txt"))]

    made = []
    if fresh([f"1200_3_6_rand_ldpc_{i}" for i in range(1, 11)]):
        made += gen_rand_reg_ldpc(10, 1200, 3, 6, seed=1, dir_path=d)
    if fresh([f"512_3_6_rand_ldpc_{i}" for i in range(1, 6)]):
        made += gen_rand_reg_ldpc(5, 512, 3, 6, seed=2, dir_path=d)
    if fresh([f"1200_rho_x5_rand_ldpc_{i}" for i in range(1, 11)]):
        made += gen_rand_irg_ldpc(10, 1200, 5, 0.5, seed=3, dir_path=d)
    for n in made:
        print("generated", n)
    print(f"codes dir {d}: {len(os.listdir(d))} files")


if __name__ == "__main__":
    main()

"""Crash-safe incremental JSON result persistence.

Same schema and merge behavior as the reference's ``utils.Saver``
(utils.py:118-156): the file is named by the joined run-id values; every
``add`` reloads the existing JSON, merges the new per-parameter values and
rewrites — so results accumulate across runs/restarts into one file and a
killed run keeps every completed log tick."""

from __future__ import annotations

import json
import os
from collections import OrderedDict

from ldpc_decoders_tpu.utils.file import load_json, make_dir_if_not_exists


class Saver:
    def __init__(self, data_dir: str, run_ids):
        self.dict = OrderedDict(run_ids)
        make_dir_if_not_exists(data_dir)
        file_name = "-".join(str(v) for v in self.dict.values())
        self.file_path = os.path.join(data_dir, f"{file_name}.json")

    def add_meta(self, key, val) -> None:
        self.dict[key] = val

    def add(self, param, val_dict) -> None:
        data = load_json(self.file_path)
        if data is None:
            data = OrderedDict(self.dict)
            for key in val_dict:
                data[key] = {}
        for key in val_dict:
            data.setdefault(key, {})[str(param)] = val_dict[key]
        self._write(data)

    def add_all(self, val_dict) -> None:
        data = OrderedDict(self.dict)
        data.update(val_dict)
        self._write(data)

    def _write(self, data) -> None:
        # Atomic: a kill mid-write must not corrupt the accumulated file
        # (the reference rewrites in place, utils.py:137-140 — losing the
        # whole history on a crash; temp+rename keeps "crash-safe" honest).
        tmp_path = self.file_path + ".tmp"
        with open(tmp_path, "w") as fp:
            json.dump(data, fp, indent=4)
        os.replace(tmp_path, self.file_path)

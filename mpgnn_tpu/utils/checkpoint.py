"""Search-state checkpoint/resume.

The reference exposes ``--pickle_filename`` and run.sh mentions
``iteration_variables.pkl``, but the argument is never used
(main.py:1504-1505, run.sh:12) — a dead resume path. Here checkpointing is
real: search results persist per label class so an interrupted multi-class
run (the reference's one-vs-rest loop, main.py:1214) resumes at the next
class. Model parameter pytrees can additionally be saved via orbax.
"""

from __future__ import annotations

import json
import os
from typing import Any


class SearchCheckpoint:
    """JSON-backed checkpoint of per-class search results."""

    def __init__(self, path: str):
        self.path = path
        self._state = {}
        if os.path.exists(path):
            with open(path) as f:
                self._state = json.load(f)

    def has(self, class_index: int) -> bool:
        return str(class_index) in self._state

    def save(self, class_index: int, result: Any) -> None:
        self._state[str(class_index)] = {
            "metapaths": result.metapaths,
            "test_f1": result.test_f1,
            "val_f1_by_path": result.val_f1_by_path,
            "discovered": result.discovered,
        }
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self._state, f)
        os.replace(tmp, self.path)

    def load(self, class_index: int):
        from mpgnn_tpu.search.engine import SearchResult

        d = self._state[str(class_index)]
        return SearchResult(
            metapaths=d["metapaths"],
            test_f1=d["test_f1"],
            val_f1_by_path=d["val_f1_by_path"],
            discovered=d["discovered"],
        )


def save_params(path: str, params) -> None:
    """Persist a model parameter pytree with orbax."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), params, force=True)
    ckptr.wait_until_finished()


def restore_params(path: str, like) -> Any:
    """Restore a parameter pytree saved by ``save_params``; ``like`` provides
    the structure/shapes."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), target=like)

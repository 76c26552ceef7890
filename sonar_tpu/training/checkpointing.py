"""Training checkpoint/resume via Orbax (new capability; the reference is
inference-only and load-only — SURVEY §5 'Checkpoint / resume').

Saves/restores ``TrainState`` pytrees (params + optimizer state + step)
with async-capable Orbax checkpointing; works under a mesh (sharded arrays
round-trip with their shardings).
"""

from __future__ import annotations

from pathlib import Path
from typing import Union

from sonar_tpu.training.train_step import TrainState


def save_train_state(path: "Union[str, Path]", state: TrainState) -> None:
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, {"params": state.params,
                          "opt_state": state.opt_state,
                          "step": state.step})


def restore_train_state(path: "Union[str, Path]", template: TrainState) -> TrainState:
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(
            path,
            {"params": template.params,
             "opt_state": template.opt_state,
             "step": template.step},
        )
    return TrainState(restored["params"], restored["opt_state"], restored["step"])

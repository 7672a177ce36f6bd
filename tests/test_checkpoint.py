"""CheckpointManager semantics: top-k pruning, averaging, and the
protection of averaged checkpoints.

Reference behaviors: keep-10-best pruning (/root/reference/train_CTC.py:
653-657), parameter averaging before eval (:479-489), and the averaged
checkpoint surviving retention after test (train_S2S.py:814-821 — the
reference protects it with an ACC=1.1 metadata hack; here averaged
entries are tagged metrics={'averaged': True} and excluded from all
selection/pruning/resume logic).
"""

import numpy as np

from mamba_asr_tpu.training.checkpoint import CheckpointManager


def _state(v: float):
    return {"params": {"w": np.full((2,), v, np.float32)},
            "step": np.int32(int(v))}


def test_topk_prune_by_min_wer(tmp_path):
    mgr = CheckpointManager(str(tmp_path), keep=2)
    for i, wer in enumerate([30.0, 10.0, 20.0]):
        mgr.save(_state(i), metrics={"WER": wer, "epoch": i + 1},
                 min_keys=("WER",), name=f"ckpt_{i}")
    names = {e["name"] for e in mgr._entries()}
    assert names == {"ckpt_1", "ckpt_2"}  # WER 10 and 20 survive


def test_averaged_checkpoint_is_invisible_to_selection(tmp_path):
    mgr = CheckpointManager(str(tmp_path), keep=2)
    mgr.save(_state(1.0), metrics={"WER": 10.0, "epoch": 1},
             min_keys=("WER",), name="ckpt_a")
    mgr.save(_state(3.0), metrics={"WER": 20.0, "epoch": 2},
             min_keys=("WER",), name="ckpt_b")
    # Saving an averaged checkpoint (evaluate() does this) must NOT evict
    # either training checkpoint, despite keep=2.
    mgr.save(_state(99.0), metrics={"WER": 5.0, "averaged": True},
             name="averaged_test")
    names = {e["name"] for e in mgr._entries()}
    assert names == {"ckpt_a", "ckpt_b"}
    assert {e["name"] for e in mgr._entries(include_averaged=True)} == {
        "ckpt_a", "ckpt_b", "averaged_test"}

    # best() ignores the averaged entry even though its WER is lowest.
    assert mgr.best(min_key="WER") == "ckpt_a"

    # Latest restore (resume candidate) skips the averaged entry.
    raw = mgr.restore_raw()
    assert float(raw["params"]["w"][0]) == 3.0

    # Averaging folds in only training checkpoints: mean(1, 3) = 2.
    full, avg = mgr.restore_averaged(
        _state(0.0), k=10, min_key="WER", select=lambda s: s["params"]
    )
    np.testing.assert_allclose(avg["w"], 2.0)
    avg_raw, _ = mgr.restore_averaged_raw(k=10, min_key="WER")
    np.testing.assert_allclose(avg_raw["w"], 2.0)

    # Explicit named restore of the averaged checkpoint still works.
    raw = mgr.restore_raw("averaged_test")
    assert float(raw["params"]["w"][0]) == 99.0

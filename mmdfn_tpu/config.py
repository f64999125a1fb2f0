"""Configuration dataclasses mirroring the reference CLI flag surface.

Every flag from ``code/run_train_erc.py:243-336`` has a field with the same
default, so the sweep-script invocations (``script/run_train_ie.sh`` /
``run_train_me.sh``) port verbatim onto :mod:`mmdfn_tpu.cli.run_train_erc`.
Hard-coded reference constants (dims table ``run_train_erc.py:359-392``,
class weights ``:398-414``, ``max_seq_len=200`` ``:421``) live here too.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field, replace
from typing import List, Optional, Tuple

import numpy as np

from mmdfn_tpu.data.datasets import FEAT2DIM

# Fixed model dims (run_train_erc.py:387-392)
D_G, D_P, D_E, D_H, D_A, GRAPH_H = 150, 150, 100, 100, 100, 100
MAX_SEQ_LEN = 200
HIDDEN_MODALITY = 200  # per-modality projection width (model.py:847-849)

IEMOCAP_CLASS_WEIGHTS = [
    1 / 0.086747, 1 / 0.144406, 1 / 0.227883,
    1 / 0.160585, 1 / 0.127711, 1 / 0.252668,
]
MELD_CLASS_WEIGHTS = [
    1.0 / 0.466750766, 1.0 / 0.122094071, 1.0 / 0.027752748,
    1.0 / 0.071544422, 1.0 / 0.171742656, 1.0 / 0.026401153,
    1.0 / 0.113714183,
]

DATASET_INFO = {
    "IEMOCAP": dict(
        n_speakers=2, n_classes=6,
        target_names=["hap", "sad", "neu", "ang", "exc", "fru"],
        class_weights=IEMOCAP_CLASS_WEIGHTS,
        D_audio=FEAT2DIM["IS10"], D_visual=FEAT2DIM["denseface"],
        D_text=FEAT2DIM["textCNN"],
    ),
    "MELD": dict(
        n_speakers=9, n_classes=7,
        target_names=["neu", "sur", "fea", "sad", "joy", "dis", "ang"],
        class_weights=MELD_CLASS_WEIGHTS,
        D_audio=FEAT2DIM["MELD_audio"], D_visual=FEAT2DIM["denseface"],
        D_text=FEAT2DIM["MELD_text"],
    ),
    # Token-id text-only dataset for DialogueGCNDailyModel; the reference
    # ships the loader (dataloader.py:71-101) and model (model.py:1446-1545)
    # but never wires them into a trainer — dims are build-side choices.
    # Label ids follow the DailyDialog annotation scheme.
    "DailyDialogue": dict(
        n_speakers=2, n_classes=7,
        target_names=["no_emo", "ang", "dis", "fea", "hap", "sad", "sur"],
        class_weights=[1.0] * 7,
        D_audio=0, D_visual=0, D_text=100,
    ),
}


@dataclass
class ExperimentConfig:
    """One field per reference CLI flag (same names, same defaults)."""

    no_cuda: bool = False                    # kept for flag parity; no-op
    dataset: str = "IEMOCAP"
    data_dir: str = "../data/iemocap/IEMOCAP_features.pkl"
    multi_modal: bool = True
    modals: str = "avl"
    mm_fusion_mthd: str = "concat_subsequently"
    use_modal: bool = False
    base_model: str = "LSTM"
    graph_model: bool = True
    graph_type: str = "GDF"
    graph_construct: str = "direct"
    use_gcn: bool = False
    nodal_attention: bool = True
    use_topic: bool = False
    use_residue: bool = True
    av_using_lstm: bool = False
    active_listener: bool = False
    attention: str = "general"
    use_crn_speaker: bool = True
    speaker_weights: str = "3-0-1"
    use_speaker: bool = False
    reason_flag: bool = False
    epochs: int = 30
    batch_size: int = 32
    valid_rate: float = 0.0
    modal_weight: float = 1.0
    Deep_GCN_nlayers: int = 16
    lr: float = 0.0003
    l2: float = 0.0001
    rec_dropout: float = 0.1
    dropout: float = 0.4
    alpha: float = 0.2
    lamda: float = 0.5
    gamma: float = 0.5
    windowp: int = 10
    windowf: int = 10
    multiheads: int = 6
    loss: str = "FocalLoss"
    class_weight: bool = False
    save_model_dir: str = "outputs/iemocap_demo/"
    tensorboard: bool = False
    test_label: bool = False
    load_model: str = ""
    seed: int = 2021
    patience: int = 5

    # --- build-side extensions (no reference counterpart) ---
    buckets: Tuple[int, ...] = (16, 24, 32, 48, 64, 96, 128, 160, 200)
    faithful_epoch_reseed: bool = True       # re-derive dropout rng per epoch
                                             # (reference run_train_erc.py:164)
    sort_batches_by_length: bool = False
    param_dtype: str = "float32"
    transfer_dtype: str = "float32"          # 'bfloat16' halves H2D bytes on
                                             # slow links (features quantized
                                             # to bf16; compute stays f32)
    matmul_precision: Optional[str] = None   # None = backend default (bf16
                                             # on TPU); 'float32'/'highest'
                                             # for strict reference parity.
                                             # Adjacency cosines are ALWAYS
                                             # f32 regardless (arccos is
                                             # ill-conditioned near +/-1).
    log_jsonl: Optional[str] = None
    gcn_compute_dtype: Optional[str] = None  # 'bfloat16' runs the GCNII layer
                                             # scan in bf16 (params stay f32,
                                             # adjacency built in f32) —
                                             # measured 1.4x on the stack;
                                             # off by default for strict
                                             # reference-f32 parity
    rnn_compute_dtype: Optional[str] = None  # 'bfloat16' runs the encoder
                                             # GRU/LSTM scans in bf16 (same
                                             # master-weight scheme)
    gcn_scan_unroll: Optional[int] = None    # GCNII layer-scan unroll; None =
                                             # full unroll (fastest on TPU,
                                             # larger program), int to cap
                                             # program size / compile time
    rnn_fuse_directions: bool = False        # run each BiRNN layer's fwd+bwd
                                             # directions in ONE lax.scan
                                             # (identical math; halves the
                                             # sequential scan count — the
                                             # flagship step's latency
                                             # ceiling)
    rnn_scan_remat: bool = False             # checkpoint the RNN scan step:
                                             # backward recomputes gate math
                                             # instead of reading per-step
                                             # residuals back from HBM
    edge_attn_type: str = "attn1"            # relation-path edge attention
                                             # branch (attn1 hard-coded
                                             # upstream, model.py:445;
                                             # attn2/attn3 dead there,
                                             # implemented behind this flag)
    rng_impl: Optional[str] = None           # 'rbg': generate dropout bits
                                             # with the TPU hardware RNG
                                             # instead of threefry (dropout=0
                                             # A/B attributes ~2.3 ms/step —
                                             # 18% — to dropout machinery,
                                             # mostly threefry bit gen).
                                             # Different (still deterministic
                                             # per seed) dropout draws; off
                                             # by default for bit-stable
                                             # parity with earlier rounds.
    gcn_backend: Optional[str] = None        # 'pallas': fully fused GCNII
                                             # train stack (fwd + custom bwd
                                             # + in-kernel PRNG dropout,
                                             # ops/pallas_gcnii_train.py);
                                             # 'pallas_fused': + stacked-
                                             # operand dots (~9 vs ~15 MXU
                                             # dispatches/layer, same math)
    gcn_bwd_block: Optional[int] = None      # batch elements per backward
                                             # grid step of the fused GCNII
                                             # kernel (shared-weight grad
                                             # dots contract Bk x the rows;
                                             # must divide batch_size, else
                                             # silently 1)
    rnn_backend: Optional[str] = None        # 'pallas': fused bi-GRU
                                             # recurrence kernel (fwd +
                                             # custom bwd, ops/pallas_rnn.py)
                                             # replacing the per-direction
                                             # lax.scan chains
    gcn_scan_remat: bool = False             # same for the GCNII layer scan
                                             # (recompute adj@h + gates in
                                             # backward)
    # DailyDialogue token frontend (CNNFeatureExtractor, model.py:1410-1443;
    # the reference hard-codes vocab/embedding sizes at its call sites)
    vocab_size: int = 5000
    max_words: int = 20                      # static token-axis width
    embedding_dim: int = 300
    cnn_filters: int = 50
    cnn_output_size: int = 100

    @property
    def info(self) -> dict:
        return DATASET_INFO[self.dataset]

    @property
    def speaker_weight_list(self) -> List[float]:
        # parsed as dash-separated floats (model.py:816)
        return list(map(float, self.speaker_weights.split("-")))

    @property
    def D_m(self) -> int:
        """The concatenated/base feature dim (run_train_erc.py:364-386)."""
        info = self.info
        D_audio, D_visual, D_text = info["D_audio"], info["D_visual"], info["D_text"]
        if self.multi_modal:
            if self.mm_fusion_mthd == "concat":
                dims = {"a": D_audio, "v": D_visual, "l": D_text}
                return sum(dims[m] for m in self.modals)
            return D_text
        return {"a": D_audio, "v": D_visual, "l": D_text}[self.modals]

    def class_weights_or_none(self):
        if self.class_weight:
            return np.asarray(self.info["class_weights"], dtype=np.float32)
        return None

    # the measured-win TPU performance knobs (see DESIGN.md "Performance
    # decisions" for each A/B).  Forward/backward math is equivalent up to
    # bf16 rounding in the GCNII stack and different-but-deterministic
    # dropout draws (hardware PRNG instead of threefry) — NOT bit-stable
    # with the parity defaults, which is why they are opt-in.
    TPU_FAST_KNOBS = dict(
        gcn_compute_dtype="bfloat16", rnn_scan_remat=True,
        rnn_backend="pallas", gcn_backend="pallas", gcn_bwd_block=2,
        rng_impl="rbg")

    def with_tpu_fast(self) -> "ExperimentConfig":
        """This config with every measured-win TPU knob enabled (the
        production bench configuration; ~2x device-busy time vs the
        bit-stable parity defaults at the flagship shapes)."""
        return replace(self, **self.TPU_FAST_KNOBS)

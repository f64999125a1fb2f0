"""Round-trip test for the reference-checkpoint importer (mmdfn_tpu.tools).

Builds the REAL reference ``DialogueGNNModel`` (its own torch init — weights
the build has never seen), imports its state_dict with
``state_dict_to_params``, and asserts forward agreement between the
reference and our model on the imported weights — the exact migration a
reference user performs.  Uses the same exactness setup as
test_reference_oracle.py (full-length single-speaker dialogues, where the
documented RNN-padding deviation vanishes).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from mmdfn_tpu.tools import state_dict_to_params
from test_reference_oracle import (  # noqa: E402 (rootdir test import)
    build_ours,
    build_reference_model,
    make_exact_batch,
    reference_forward,
)


def test_imported_reference_weights_reproduce_forward(rng):
    B, L, NL = 3, 7, 4
    torch.manual_seed(7)
    ref = build_reference_model(NL, dropout=0.3)
    ref.eval()

    batch = make_exact_batch(rng, B, L)
    with torch.no_grad():
        theirs = reference_forward(ref, batch).numpy()

    ours_model = build_ours(NL, dropout=0.3)
    template = ours_model.init(
        jax.random.PRNGKey(0), jnp.array(batch["text"]),
        jnp.array(batch["qmask"]), jnp.array(batch["umask"]),
        jnp.array(batch["audio"]), jnp.array(batch["visual"]),
        deterministic=True)
    params = state_dict_to_params(ref.state_dict(), template["params"])
    ours = np.asarray(ours_model.apply(
        {"params": params}, jnp.array(batch["text"]),
        jnp.array(batch["qmask"]), jnp.array(batch["umask"]),
        jnp.array(batch["audio"]), jnp.array(batch["visual"]),
        deterministic=True))

    diff = np.abs(ours.reshape(B * L, -1) - theirs)
    print(f"\nimported-weights forward diff: max={diff.max():.2e}")
    assert diff.max() < 1e-4


def test_import_rejects_mismatched_architecture(rng):
    torch.manual_seed(7)
    ref = build_reference_model(4, dropout=0.3)
    batch = make_exact_batch(rng, 2, 5)
    ours_model = build_ours(8, dropout=0.3)        # nlayers mismatch
    template = ours_model.init(
        jax.random.PRNGKey(0), jnp.array(batch["text"]),
        jnp.array(batch["qmask"]), jnp.array(batch["umask"]),
        jnp.array(batch["audio"]), jnp.array(batch["visual"]),
        deterministic=True)
    with pytest.raises(KeyError):
        state_dict_to_params(ref.state_dict(), template["params"])


def test_import_reference_checkpoint_torch_save_roundtrip(rng, tmp_path):
    """The reference's actual checkpoint format: torch.save of the whole
    module (run_train_erc.py:532) -> import_reference_checkpoint -> params
    identical to the direct state_dict import."""
    from mmdfn_tpu.config import ExperimentConfig
    from mmdfn_tpu.tools import import_reference_checkpoint

    NL = 2
    torch.manual_seed(3)
    ref = build_reference_model(NL, dropout=0.4)
    path = str(tmp_path / "reference_model.pkl")
    torch.save(ref, path)

    cfg = ExperimentConfig(
        dataset="IEMOCAP", graph_type="GDF", reason_flag=True,
        Deep_GCN_nlayers=NL, speaker_weights="3-0-1")
    state = import_reference_checkpoint(path, cfg)

    direct = state_dict_to_params(
        ref.state_dict(),
        jax.tree_util.tree_map(np.asarray, state.params))
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(direct)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_import_gf_variant_without_reason_lstm(rng):
    """graph_type='GF' (MMGCN: reason_flag=False): the reference still
    allocates the reason-LSTM (model_GCN.py:433) but never runs it — the
    importer must skip those keys and still cover every live weight."""
    from mmdfn_tpu.models import DialogueGNN
    from test_reference_oracle import ALPHA, LAMDA, DATASETS

    B, L, NL = 3, 6, 2
    torch.manual_seed(9)
    ref = build_reference_model(NL, dropout=0.2, reason_flag=False)
    ref.eval()
    batch = make_exact_batch(rng, B, L)
    with torch.no_grad():
        theirs = reference_forward(ref, batch).numpy()

    d = DATASETS["IEMOCAP"]
    ours_model = DialogueGNN(
        base_model="LSTM", D_m=d["d_text"], D_m_a=d["d_audio"],
        D_m_v=d["d_visual"], n_speakers=d["n_speakers"],
        n_classes=d["n_classes"], dropout=0.2, graph_type="GF",
        reason_flag=False, deep_gcn_nlayers=NL, use_crn_speaker=True,
        speaker_weights=d["sw"], alpha=ALPHA, lamda=LAMDA)
    template = ours_model.init(
        jax.random.PRNGKey(0), jnp.array(batch["text"]),
        jnp.array(batch["qmask"]), jnp.array(batch["umask"]),
        jnp.array(batch["audio"]), jnp.array(batch["visual"]),
        deterministic=True)
    params = state_dict_to_params(ref.state_dict(), template["params"])
    ours = np.asarray(ours_model.apply(
        {"params": params}, jnp.array(batch["text"]),
        jnp.array(batch["qmask"]), jnp.array(batch["umask"]),
        jnp.array(batch["audio"]), jnp.array(batch["visual"]),
        deterministic=True))
    diff = np.abs(ours.reshape(B * L, -1) - theirs)
    print(f"\nGF imported-weights forward diff: max={diff.max():.2e}")
    assert diff.max() < 1e-4


def test_import_gf2_checkpoint_reproduces_forward(rng):
    """GF2 import (VERDICT r4 missing #3): a reference MM_GCN2 checkpoint
    (its own torch init) transplants into our GF2 model with forward
    agreement.  use_residue=False so the genuine reference forward runs
    under the arity shim alone (see test_reference_oracle's GF2 bug pins)."""
    from test_reference_oracle import _gf2_arity_shim

    B, L = 2, 6
    torch.manual_seed(5)
    ref = build_reference_model(2, dropout=0.4, graph_type="GF2",
                                use_residue=False)
    ref.eval()
    batch = make_exact_batch(rng, B, L)
    with torch.no_grad(), _gf2_arity_shim():
        theirs = reference_forward(ref, batch).numpy()

    ours_model = build_ours(64, dropout=0.4, graph_type="GF2",
                            use_residue=False)
    template = ours_model.init(
        jax.random.PRNGKey(0), jnp.array(batch["text"]),
        jnp.array(batch["qmask"]), jnp.array(batch["umask"]),
        jnp.array(batch["audio"]), jnp.array(batch["visual"]),
        deterministic=True)
    params = state_dict_to_params(ref.state_dict(), template["params"])
    ours = np.asarray(ours_model.apply(
        {"params": params}, jnp.array(batch["text"]),
        jnp.array(batch["qmask"]), jnp.array(batch["umask"]),
        jnp.array(batch["audio"]), jnp.array(batch["visual"]),
        deterministic=True))

    diff = np.abs(ours.reshape(B * L, -1) - theirs)
    print(f"\nGF2 imported-weights forward diff: max={diff.max():.2e}")
    assert diff.max() < 1e-4


def test_import_relation_checkpoint_reproduces_forward(rng):
    """Multimodal relation import (VERDICT r4 missing #3): a reference
    relation checkpoint (three RGCN+GraphConv nets + attn1 edge attention)
    transplants with forward agreement."""
    from mmdfn_tpu.models import DialogueGNN
    from test_reference_oracle import ALPHA, LAMDA, DATASETS

    B, L = 3, 7
    d = DATASETS["IEMOCAP"]
    torch.manual_seed(6)
    ref = build_reference_model(2, dropout=0.4, graph_type="relation")
    ref.eval()
    batch = make_exact_batch(rng, B, L)
    with torch.no_grad():
        theirs = reference_forward(ref, batch).numpy()

    ours_model = DialogueGNN(
        base_model="LSTM", D_m=d["d_text"], D_m_a=d["d_audio"],
        D_m_v=d["d_visual"], n_speakers=d["n_speakers"],
        n_classes=d["n_classes"], dropout=0.4, graph_type="relation",
        reason_flag=False, deep_gcn_nlayers=2, use_crn_speaker=True,
        speaker_weights=d["sw"], alpha=ALPHA, lamda=LAMDA)
    template = ours_model.init(
        jax.random.PRNGKey(0), jnp.array(batch["text"]),
        jnp.array(batch["qmask"]), jnp.array(batch["umask"]),
        jnp.array(batch["audio"]), jnp.array(batch["visual"]),
        deterministic=True)
    params = state_dict_to_params(ref.state_dict(), template["params"])
    ours = np.asarray(ours_model.apply(
        {"params": params}, jnp.array(batch["text"]),
        jnp.array(batch["qmask"]), jnp.array(batch["umask"]),
        jnp.array(batch["audio"]), jnp.array(batch["visual"]),
        deterministic=True))

    diff = np.abs(ours.reshape(B * L, -1) - theirs)
    print(f"\nrelation imported-weights forward diff: max={diff.max():.2e}")
    assert diff.max() < 1e-4


def test_import_gf2_torch_save_to_test_label_eval(rng, tmp_path):
    """The reference user's full migration for GF2: torch.save whole-module
    pickle -> import_reference_checkpoint -> Trainer eval (the --test_label
    restore flow, run_train_erc.py:531-549)."""
    from mmdfn_tpu.config import ExperimentConfig
    from mmdfn_tpu.data.datasets import IEMOCAPDataset
    from mmdfn_tpu.data.synthetic import make_synthetic_iemocap_pickle
    from mmdfn_tpu.tools import import_reference_checkpoint
    from mmdfn_tpu.train import Trainer

    torch.manual_seed(4)
    ref = build_reference_model(2, dropout=0.4, graph_type="GF2",
                                use_residue=False)
    path = str(tmp_path / "reference_gf2.pkl")
    torch.save(ref, path)

    cfg = ExperimentConfig(dataset="IEMOCAP", graph_type="GF2",
                           use_residue=False, reason_flag=False,
                           batch_size=2, buckets=(8,),
                           speaker_weights="3-0-1")
    state = import_reference_checkpoint(path, cfg)

    pkl = str(tmp_path / "iem.pkl")
    make_synthetic_iemocap_pickle(pkl, n_train=2, n_test=2, min_len=4,
                                  max_len=8, seed=3)
    test = IEMOCAPDataset(pkl, False).dialogues()
    m = Trainer(cfg).evaluate(state, test)
    assert np.isfinite(m.loss) and 0 <= m.acc <= 100


def _forward_pair(ref, ours_model, batch, B, L):
    """theirs (real reference, eval) and ours (imported weights) packed
    log-probs."""
    ref.eval()
    with torch.no_grad():
        theirs = reference_forward(ref, batch).numpy()
    template = ours_model.init(
        jax.random.PRNGKey(0), jnp.array(batch["text"]),
        jnp.array(batch["qmask"]), jnp.array(batch["umask"]),
        jnp.array(batch["audio"]), jnp.array(batch["visual"]),
        deterministic=True)
    params = state_dict_to_params(ref.state_dict(), template["params"])
    ours = np.asarray(ours_model.apply(
        {"params": params}, jnp.array(batch["text"]),
        jnp.array(batch["qmask"]), jnp.array(batch["umask"]),
        jnp.array(batch["audio"]), jnp.array(batch["visual"]),
        deterministic=True))
    return ours.reshape(B * L, -1), theirs


def test_import_then_streaming_serve_matches_reference(rng, tmp_path):
    """The COMPLETE migration chain a reference user performs: torch.save
    whole-module pickle -> importer CLI (writes our checkpoint format) ->
    restore -> per-utterance streaming serve — and every streamed
    prediction agrees with the REAL reference's forward on the same
    prefix."""
    from mmdfn_tpu.config import ExperimentConfig
    from mmdfn_tpu.runtime import checkpoint as ckpt_lib
    from mmdfn_tpu.serve import StreamingSession
    from mmdfn_tpu.tools.import_torch_checkpoint import main as import_main
    from mmdfn_tpu.train import Trainer

    NL, L = 2, 6
    torch.manual_seed(21)
    ref = build_reference_model(NL, dropout=0.3)
    ref.eval()
    pkl_path = str(tmp_path / "ref_model.pkl")
    torch.save(ref, pkl_path)
    out_dir = str(tmp_path / "imported")
    assert import_main(["--load_model", pkl_path, "--out", out_dir,
                        "--Deep_GCN_nlayers", str(NL)]) == 0

    cfg = ExperimentConfig(graph_type="GDF", reason_flag=True,
                           Deep_GCN_nlayers=NL, speaker_weights="3-0-1")
    trainer = Trainer(cfg)
    state, _ = ckpt_lib.restore_checkpoint(out_dir, trainer.init_state())
    session = StreamingSession(trainer, state, buckets=(8,))

    batch = make_exact_batch(rng, 1, L)
    logps = []
    for t in range(L):
        spk = int(np.argmax(batch["qmask"][0, t]))
        _, logp = session.append(batch["text"][0, t], batch["audio"][0, t],
                                 batch["visual"][0, t], spk)
        logps.append(np.asarray(logp))

    for t in (2, L - 1):             # mid-dialogue and full-length prefixes
        prefix = {k: v[:, : t + 1] for k, v in batch.items()}
        with torch.no_grad():
            theirs = reference_forward(ref, prefix).numpy()
        diff = np.abs(logps[t] - theirs[t])
        print(f"\nstreamed-vs-reference prefix t={t}: max={diff.max():.2e}")
        assert diff.max() < 1e-4


def test_import_relation_use_gcn_checkpoint_reproduces_forward(rng):
    """--use_gcn relation checkpoints: conv3/conv4 (plain linears — the
    upstream 'GCN branch' runs an identity adjacency, DESIGN.md) import
    alongside the RGCN/GraphConv nets; the allocated-but-unrun wider
    linear/matchatt are dead keys."""
    from mmdfn_tpu.models import DialogueGNN
    from test_reference_oracle import ALPHA, LAMDA, DATASETS

    B, L = 2, 6
    d = DATASETS["IEMOCAP"]
    torch.manual_seed(18)
    ref = build_reference_model(2, dropout=0.4, graph_type="relation",
                                use_GCN=True)
    # upstream's use_GCN head is mis-sized (900 vs the 1200-wide concat,
    # model.py:985 — pinned by the oracle test); a trainable checkpoint
    # necessarily carries the fixed head, so the round-trip does too
    ref.smax_fc = torch.nn.Linear(1200, d["n_classes"])
    batch = make_exact_batch(rng, B, L)
    ours_model = DialogueGNN(
        base_model="LSTM", D_m=d["d_text"], D_m_a=d["d_audio"],
        D_m_v=d["d_visual"], n_speakers=d["n_speakers"],
        n_classes=d["n_classes"], dropout=0.4, graph_type="relation",
        reason_flag=False, deep_gcn_nlayers=2, use_crn_speaker=True,
        use_gcn=True, speaker_weights=d["sw"], alpha=ALPHA, lamda=LAMDA)
    ours, theirs = _forward_pair(ref, ours_model, batch, B, L)
    diff = np.abs(ours - theirs)
    print(f"\nrelation/use_GCN imported-weights diff: max={diff.max():.2e}")
    assert diff.max() < 1e-4


def test_import_relation_single_stream_checkpoint_reproduces_forward(rng):
    """Single-stream relation (att_type='concat'): its own encoder layout
    (linear_ + lstm) and the GraphNetwork's full in-net classifier import
    with forward agreement."""
    from mmdfn_tpu.models import DialogueGNN
    from test_reference_oracle import (ALPHA, LAMDA, DATASETS, D_A, D_E,
                                       D_G, D_H, D_P, GRAPH_H,
                                       load_reference)

    B, L = 2, 6
    d = DATASETS["IEMOCAP"]
    torch.manual_seed(19)
    ref_model, _ = load_reference()
    ref = ref_model.DialogueGNNModel(
        "LSTM", d["d_text"], D_G, D_P, D_E, D_H, D_A, GRAPH_H,
        n_speakers=d["n_speakers"], max_seq_len=200, window_past=10,
        window_future=10, n_classes=d["n_classes"], listener_state=False,
        context_attention="general", dropout=0.4, nodal_attention=True,
        no_cuda=True, graph_type="relation", use_topic=False, alpha=ALPHA,
        lamda=LAMDA, multiheads=6, graph_construct="direct", use_GCN=False,
        use_residue=True, D_m_v=d["d_visual"], D_m_a=d["d_audio"],
        modals="avl", att_type="concat", av_using_lstm=False,
        Deep_GCN_nlayers=2, dataset="IEMOCAP", use_speaker=False,
        use_modal=False, reason_flag=False, multi_modal=True,  # flips off
        use_crn_speaker=True, speaker_weights=d["sw"], modal_weight=1.0)
    assert not ref.multi_modal
    ref.eval()

    batch = make_exact_batch(rng, B, L)
    from test_reference_oracle import reference_forward
    with torch.no_grad():
        theirs = reference_forward(ref, batch).numpy()

    ours_model = DialogueGNN(
        base_model="LSTM", D_m=d["d_text"], D_m_a=d["d_audio"],
        D_m_v=d["d_visual"], n_speakers=d["n_speakers"],
        n_classes=d["n_classes"], dropout=0.4, graph_type="relation",
        att_type="concat", multi_modal=False, reason_flag=False,
        deep_gcn_nlayers=2, use_crn_speaker=True, speaker_weights=d["sw"],
        alpha=ALPHA, lamda=LAMDA)
    template = ours_model.init(
        jax.random.PRNGKey(0), jnp.array(batch["text"]),
        jnp.array(batch["qmask"]), jnp.array(batch["umask"]),
        deterministic=True)
    params = state_dict_to_params(ref.state_dict(), template["params"])
    ours = np.asarray(ours_model.apply(
        {"params": params}, jnp.array(batch["text"]),
        jnp.array(batch["qmask"]), jnp.array(batch["umask"]),
        deterministic=True))
    diff = np.abs(ours.reshape(B * L, -1) - theirs)
    print(f"\nrelation single-stream imported-weights diff: "
          f"max={diff.max():.2e}")
    assert diff.max() < 1e-4


@pytest.mark.parametrize("reason_flag", [True, False])
def test_import_deepgcn_checkpoint_reproduces_forward(rng, reason_flag):
    """DeepGCN import (three per-modality GCNII stacks, model.py:930-940):
    reference-initialized weights transplant with forward agreement, with
    and without the reason-LSTM."""
    B, L, NL = 2, 6, 4
    torch.manual_seed(11)
    ref = build_reference_model(NL, dropout=0.4, reason_flag=reason_flag,
                                graph_type="DeepGCN")
    batch = make_exact_batch(rng, B, L)
    ours_model = build_ours(NL, dropout=0.4, graph_type="DeepGCN",
                            reason_flag=reason_flag)
    ours, theirs = _forward_pair(ref, ours_model, batch, B, L)
    diff = np.abs(ours - theirs)
    print(f"\nDeepGCN imported-weights diff (reason={reason_flag}): "
          f"max={diff.max():.2e}")
    assert diff.max() < 1e-4


def test_import_gcn3_checkpoint_reproduces_forward(rng):
    """GCN3 import (two GCNLayer1 over the speaker chain,
    model.py:910-921).  B=1: the reference's speaker-graph builder is
    batch-degenerate beyond dialogue 0 (see
    test_reference_oracle.test_gcn3_reference_speaker_graph_batch_degeneracy),
    so single-dialogue is where agreement is well-defined."""
    B, L = 1, 7
    torch.manual_seed(12)
    ref = build_reference_model(2, dropout=0.4, graph_type="GCN3")
    batch = make_exact_batch(rng, B, L)
    ours_model = build_ours(2, dropout=0.4, graph_type="GCN3",
                            reason_flag=False)
    ours, theirs = _forward_pair(ref, ours_model, batch, B, L)
    diff = np.abs(ours - theirs)
    print(f"\nGCN3 imported-weights diff: max={diff.max():.2e}")
    assert diff.max() < 1e-4


def test_import_none_gated_checkpoint_reproduces_forward(rng):
    """graph_type='None' with the GATED fusion head (model.py:960-976,
    1353-1399): the fusion params (gatedatt) must be imported, not treated
    as dead, exactly because our tree allocates them."""
    B, L = 2, 6
    torch.manual_seed(13)
    ref = build_reference_model(2, dropout=0.4, graph_type="None",
                                att_type="gated")
    batch = make_exact_batch(rng, B, L)
    ours_model = build_ours(2, dropout=0.4, graph_type="None",
                            att_type="gated", reason_flag=False)
    ours, theirs = _forward_pair(ref, ours_model, batch, B, L)
    diff = np.abs(ours - theirs)
    print(f"\nNone/gated imported-weights diff: max={diff.max():.2e}")
    assert diff.max() < 1e-4


def test_import_av_using_lstm_checkpoint_reproduces_forward(rng):
    """--av_using_lstm: the audio/visual bi-GRU encoders (model.py:854-1096)
    import alongside the flagship GDF stack."""
    B, L, NL = 2, 6, 2
    torch.manual_seed(14)
    ref = build_reference_model(NL, dropout=0.3, av_using_lstm=True)
    batch = make_exact_batch(rng, B, L)
    ours_model = build_ours(NL, dropout=0.3, av_using_lstm=True)
    ours, theirs = _forward_pair(ref, ours_model, batch, B, L)
    diff = np.abs(ours - theirs)
    print(f"\nav_using_lstm imported-weights diff: max={diff.max():.2e}")
    assert diff.max() < 1e-4


@pytest.mark.parametrize("kind", ["GRU", "LSTM"])
def test_import_basic_recurrent_checkpoint_reproduces_forward(rng, kind):
    """The non-graph GRU/LSTM baselines (model.py:281-356, trained with
    --no_graph_model): 2-layer bi-recurrence + MatchingAttention head."""
    from mmdfn_tpu.models.baselines import GRUModel, LSTMModel
    from test_reference_oracle import load_reference

    B, L, D_m, D_e, D_h, NC = 2, 6, 24, 16, 12, 6
    torch.manual_seed(15)
    ref_model, _ = load_reference()
    ref_cls = ref_model.LSTMModel if kind == "LSTM" else ref_model.GRUModel
    ref = ref_cls(D_m, D_e, D_h, n_classes=NC, dropout=0.4)
    ref.eval()

    U = rng.standard_normal((B, L, D_m)).astype(np.float32)
    umask = np.ones((B, L), np.float32)
    qmask = np.zeros((B, L, 2), np.float32)
    qmask[:, :, 0] = 1.0
    tt = lambda a: torch.tensor(np.swapaxes(a, 0, 1))
    with torch.no_grad():
        theirs = ref(tt(U), tt(qmask), torch.tensor(umask))[0].numpy()

    cls = LSTMModel if kind == "LSTM" else GRUModel
    ours_model = cls(D_m, D_e, D_h, n_classes=NC, dropout=0.4)
    template = ours_model.init(jax.random.PRNGKey(0), jnp.array(U),
                               jnp.array(qmask), jnp.array(umask),
                               deterministic=True)
    params = state_dict_to_params(ref.state_dict(), template["params"])
    ours = np.asarray(ours_model.apply(
        {"params": params}, jnp.array(U), jnp.array(qmask),
        jnp.array(umask), deterministic=True))
    diff = np.abs(ours - np.swapaxes(theirs, 0, 1))
    print(f"\n{kind} baseline imported-weights diff: max={diff.max():.2e}")
    assert diff.max() < 1e-4


@pytest.mark.parametrize("context_attention,listener",
                         [("simple", False), ("general", True)])
def test_import_dialogrnn_checkpoint_reproduces_forward(
        rng, context_attention, listener):
    """The DialogRNN baseline (model.py:359-417): party/global/emotion
    GRU cells (+ listener cell), simple/general context attention, head."""
    from mmdfn_tpu.models.baselines import DialogRNNModel
    from test_reference_oracle import load_reference

    B, L, D_m, NC = 2, 5, 20, 6
    D_g = D_p = 14
    D_e = D_h = D_a = 12
    torch.manual_seed(16)
    ref_model, _ = load_reference()
    ref = ref_model.DialogRNNModel(
        D_m, D_g, D_p, D_e, D_h, D_a, n_classes=NC,
        listener_state=listener, context_attention=context_attention,
        dropout_rec=0.5, dropout=0.4)
    ref.eval()

    U = rng.standard_normal((B, L, D_m)).astype(np.float32)
    umask = np.ones((B, L), np.float32)
    spk = rng.integers(0, 2, size=(B, L))
    qmask = np.zeros((B, L, 2), np.float32)
    qmask[np.arange(B)[:, None], np.arange(L)[None, :], spk] = 1.0
    tt = lambda a: torch.tensor(np.swapaxes(a, 0, 1))
    with torch.no_grad():
        theirs = ref(tt(U), tt(qmask), torch.tensor(umask))[0].numpy()

    ours_model = DialogRNNModel(
        D_m, D_g, D_p, D_e, D_h, D_a, n_classes=NC,
        listener_state=listener, context_attention=context_attention,
        dropout_rec=0.5, dropout=0.4)
    template = ours_model.init(jax.random.PRNGKey(0), jnp.array(U),
                               jnp.array(qmask), jnp.array(umask),
                               deterministic=True)
    params = state_dict_to_params(ref.state_dict(), template["params"])
    ours = np.asarray(ours_model.apply(
        {"params": params}, jnp.array(U), jnp.array(qmask),
        jnp.array(umask), deterministic=True))
    diff = np.abs(ours - np.swapaxes(theirs, 0, 1))
    print(f"\nDialogRNN/{context_attention} listener={listener} "
          f"imported-weights diff: max={diff.max():.2e}")
    assert diff.max() < 1e-4


def test_import_gru_baseline_through_trainer_eval(rng, tmp_path):
    """Full migration for a --no_graph_model baseline: torch.save of the
    reference GRUModel at the trainer's dims -> import_reference_checkpoint
    (family auto-detected) -> Trainer eval."""
    from mmdfn_tpu.config import D_E, D_H, ExperimentConfig
    from mmdfn_tpu.data.datasets import IEMOCAPDataset
    from mmdfn_tpu.data.synthetic import make_synthetic_iemocap_pickle
    from mmdfn_tpu.tools import import_reference_checkpoint
    from mmdfn_tpu.train import Trainer
    from test_reference_oracle import load_reference

    torch.manual_seed(17)
    ref_model, _ = load_reference()
    ref = ref_model.GRUModel(100, D_E, D_H, n_classes=6, dropout=0.4)
    path = str(tmp_path / "reference_gru.pkl")
    torch.save(ref, path)

    cfg = ExperimentConfig(dataset="IEMOCAP", graph_model=False,
                           base_model="GRU", batch_size=2, buckets=(8,),
                           speaker_weights="3-0-1")
    state = import_reference_checkpoint(path, cfg)

    pkl = str(tmp_path / "iem.pkl")
    make_synthetic_iemocap_pickle(pkl, n_train=2, n_test=2, min_len=4,
                                  max_len=8, seed=5)
    test = IEMOCAPDataset(pkl, False).dialogues()
    m = Trainer(cfg).evaluate(state, test)
    assert np.isfinite(m.loss) and 0 <= m.acc <= 100

"""Training stack tests: labels, dataset formats, CNN training dynamics."""

import os

import numpy as np
import pytest

from hevc_tpu.train import dataset, labels, train_cnn
from hevc_tpu.evaltools import hm

from tests.test_e2e_bitstream import synth_frame


def test_reference_sample_format_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    luma = rng.randint(0, 256, (10, 64, 64)).astype(np.uint8)
    d22 = rng.randint(0, 4, (10, 4, 4)).astype(np.uint8)
    d32 = rng.randint(0, 4, (10, 4, 4)).astype(np.uint8)
    p = str(tmp_path / "samples.dat")
    dataset.write_reference_samples(p, luma, {22: d22, 32: d32})
    assert os.path.getsize(p) == 10 * dataset.SAMPLE_BYTES
    luma2, by_qp = dataset.read_reference_samples(p)
    np.testing.assert_array_equal(luma2, luma)
    assert set(by_qp) == {22, 32}
    np.testing.assert_array_equal(by_qp[22], d22)
    np.testing.assert_array_equal(by_qp[32], d32)


def test_own_label_extraction_shapes():
    frames = [synth_frame(128, 96, seed=s) for s in range(2)]
    lab = labels.extract_labels_own(frames, 32, 128, 96)
    assert lab.shape == (2, 6, 8)
    assert lab.max() <= 3


@pytest.mark.skipif(not os.path.exists(hm.ENCODER),
                    reason="HM encoder not built")
def test_hm_label_extraction(tmp_path):
    frames = [synth_frame(64, 64, seed=7)]
    lab = labels.extract_labels_hm(frames, 32, 64, 64,
                                   workdir=str(tmp_path))
    assert lab.shape == (1, 4, 4)
    assert lab.max() <= 3


def test_cnn_training_learns(tmp_path):
    """Tiny run: loss decreases and level-1 accuracy beats chance on a
    learnable synthetic rule (flat patches -> depth 0, busy -> depth 3)."""
    rng = np.random.RandomState(1)
    n = 512
    luma = np.zeros((n, 64, 64), np.uint8)
    depth4 = np.zeros((n, 4, 4), np.uint8)
    for i in range(n):
        if i % 2 == 0:
            luma[i] = rng.randint(0, 30)  # flat -> no split
            depth4[i] = 0
        else:
            luma[i] = rng.randint(0, 256, (64, 64))  # noise -> full split
            depth4[i] = 3
    qp = np.full((n,), 32, np.uint8)

    cfg = train_cnn.TrainConfig(iters=60, eval_every=30, batch_size=32,
                                eval_batch=128, log=False, lr=0.003)
    params, history = train_cnn.train(luma, qp, depth4, cfg)
    assert len(history) >= 2
    assert history[-1]["train_loss"] < history[0]["train_loss"] * 1.05
    assert history[-1]["acc_64"] > 0.75, history

    p = str(tmp_path / "model.npz")
    train_cnn.save_params(p, params)
    params2 = train_cnn.load_params(p)
    assert set(params2) == set(params)


def test_qp_band_selection():
    assert train_cnn.band_for_qp(22) == "qp20~25"
    assert train_cnn.band_for_qp(27) == "qp25~30"
    assert train_cnn.band_for_qp(32) == "qp30~35"
    assert train_cnn.band_for_qp(37) == "qp35~40"


def test_ldp_sample_format_roundtrip(tmp_path):
    from hevc_tpu.train import dataset_ldp
    rng = np.random.RandomState(4)
    n = 6
    resi = {qp: rng.randint(0, 256, (n, 64, 64)).astype(np.uint8)
            for qp in (22, 27, 32, 37)}
    dep = {qp: rng.randint(0, 4, (n, 4, 4)).astype(np.uint8)
           for qp in (22, 27, 32, 37)}
    line = np.arange(n) // 3
    col = np.arange(n) % 3
    p = str(tmp_path / "ldp.dat")
    dataset_ldp.write_reference_ldp_samples(p, resi, dep, 7, line, col,
                                            seq=2, mode="wb")
    assert os.path.getsize(p) == n * dataset_ldp.LDP_SAMPLE_BYTES
    out = dataset_ldp.read_reference_ldp_samples(p)
    assert (out["frame_idx"] == 7).all()
    assert (out["seq"] == 2).all()
    np.testing.assert_array_equal(out["line"], line)
    np.testing.assert_array_equal(out["blocks"][0]["qp"],
                                  np.full(n, 22, np.uint8))
    np.testing.assert_array_equal(out["blocks"][2]["resi"], resi[32])
    np.testing.assert_array_equal(out["blocks"][3]["depth4"], dep[37])


def test_ldp_chain_building():
    from hevc_tpu.train import dataset_ldp
    rng = np.random.RandomState(5)
    # 2 CTU positions x 25 frames
    n_frames, n_pos = 25, 2
    N = n_frames * n_pos
    resi = rng.randint(0, 256, (N, 64, 64)).astype(np.uint8)
    depth4 = rng.randint(0, 4, (N, 4, 4)).astype(np.uint8)
    frame_idx = np.repeat(np.arange(n_frames), n_pos)
    line = np.tile(np.array([0, 0]), n_frames)
    col = np.tile(np.array([0, 1]), n_frames)
    seq = np.zeros(N, np.int32)
    cr, cd, cf = dataset_ldp.build_ldp_chains(resi, depth4, frame_idx,
                                              line, col, seq,
                                              chain_len=20, stride=10)
    assert cr.shape[1:] == (20, 64, 64)
    assert cr.shape[0] == 2  # one full chain per CTU position (25 frames)
    np.testing.assert_array_equal(cf[0], np.arange(20) % 4)


def test_bd_rate_math():
    from hevc_tpu.evaltools import bdrate
    # identical curves -> 0%
    r = [1000., 2000., 4000., 8000.]
    p = [30., 33., 36., 39.]
    assert abs(bdrate.bd_rate(r, p, r, p)) < 1e-9
    # B uses 10% more bits at equal psnr -> ~ +10%
    r2 = [x * 1.1 for x in r]
    v = bdrate.bd_rate(r, p, r2, p)
    assert 9.0 < v < 11.0, v


def test_ra_encode_display_order():
    from hevc_tpu.train import dataset_ldp as dl
    # full GOPs: 17 frames = IDR + 2 GOP-8s
    n = 17
    disp = [dl.encode_to_display_order("RA", i, n) for i in range(n)]
    assert disp[0] == 0
    assert disp[1:9] == [8, 4, 2, 1, 3, 6, 5, 7]
    assert disp[9:] == [16, 12, 10, 9, 11, 14, 13, 15]
    assert sorted(disp) == list(range(n))
    # tail GOP shorter than 8 keeps relative order of surviving frames
    n = 12
    disp = [dl.encode_to_display_order("RA", i, n) for i in range(n)]
    assert sorted(disp) == list(range(n))
    assert disp[9:] == [1 + 8 + x for x in (1, 0, 2)]  # POCs 4,2,... < 3
    # LDP/LDB are identity
    assert all(dl.encode_to_display_order("LDP", i, 9) == i
               for i in range(9))
    inv = dl.display_to_encode_order("RA", 17)
    for i in range(17):
        assert dl.encode_to_display_order("RA", int(inv[i]), 17) == i


def test_build_samples_encode_order_ra():
    from hevc_tpu.train import dataset_ldp as dl
    rng = np.random.RandomState(3)
    n_frames, n_ctu = 10, 4
    resi = {qp: rng.randint(0, 256, (n_frames, n_ctu, 64, 64), np.uint8)
            for qp in (22, 27, 32, 37)}
    dep = {qp: rng.randint(0, 4, (n_frames, n_ctu, 4, 4), np.uint8)
           for qp in (22, 27, 32, 37)}
    line = np.arange(n_ctu, dtype=np.int32)
    col = np.arange(n_ctu, dtype=np.int32)[::-1].copy()
    rs, ds, fidx, ln, cl = dl.build_samples_encode_order(
        "RA", resi, dep, line, col)
    assert rs[22].shape == ((n_frames - 1) * n_ctu, 64, 64)
    assert fidx.shape == ((n_frames - 1) * n_ctu,)
    assert 0 not in fidx  # IDR skipped
    # first encoded inter frame of RA GOP is display index 8 (GOP tail=9
    # frames -> full table applies)
    assert fidx[0] == dl.encode_to_display_order("RA", 1, n_frames)
    i_disp = int(fidx[0])
    assert np.array_equal(rs[27][:n_ctu], resi[27][i_disp])
    assert np.array_equal(ds[37][:n_ctu], dep[37][i_disp])


def test_resi_cnn_pretraining_learns():
    """Residue-CNN stage-1 trainer: loss decreases, accuracy beats chance
    on a learnable rule (flat residue -> no split, busy -> full split)."""
    from hevc_tpu.train import train_resi_cnn
    rng = np.random.RandomState(2)
    n = 256
    qps = (22, 27, 32, 37)
    resi = {qp: np.full((n, 64, 64), 128, np.uint8) for qp in qps}
    dep = {qp: np.zeros((n, 4, 4), np.uint8) for qp in qps}
    for qp in qps:
        busy = rng.randint(0, 256, (n // 2, 64, 64)).astype(np.uint8)
        resi[qp][1::2] = busy
        dep[qp][1::2] = 3
    fig = (np.arange(n) % 4).astype(np.int32)

    cfg = train_resi_cnn.ResiCNNTrainConfig(
        iters=60, eval_every=30, batch_size=32, eval_batch=128,
        log=False, lr=0.003)
    params, history = train_resi_cnn.train(resi, dep, fig, cfg)
    assert len(history) >= 2
    assert history[-1]["train_loss"] < history[0]["train_loss"] * 1.05
    assert history[-1]["acc_64"] > 0.75, history
    # warm-started params drop into the LSTM step unchanged
    import jax.numpy as jnp
    from hevc_tpu.models import eth_lstm
    probs, state = eth_lstm.step_jit(
        params, jnp.asarray(resi[32][:4]), jnp.full((4,), 32.0),
        jnp.zeros((4,), jnp.int32), eth_lstm.zero_state(4))
    assert probs.shape == (4, 21)


def test_ldp_label_residue_extraction():
    """One ungated LDP encode yields per-P-frame labels + residues."""
    from tests.test_e2e_bitstream import synth_frame
    frames = [synth_frame(128, 128, seed=0) for _ in range(3)]
    depth4, resi, pocs = labels.extract_labels_ldp(frames, 32, 128, 128)
    assert depth4.shape == (2, 4, 4, 4)   # 2 P frames, 4 CTUs
    assert resi.shape == (2, 4, 64, 64)
    np.testing.assert_array_equal(pocs, [1, 2])
    assert depth4.max() <= 3
    # residue is 128-centered; a mostly-static synthetic pair stays close
    assert abs(float(resi.astype(np.int32).mean()) - 128.0) < 12.0


def test_train_resume_and_nan_guard(tmp_path):
    """IS_RELOAD-style resume (train_LSTM_CTU64.py:40-41 semantics):
    interrupted run + resume reproduces the uninterrupted run's stream
    position and history; a poisoned (NaN-producing) batch leaves the
    parameters finite (step no-op guard)."""
    rng = np.random.RandomState(3)
    n = 128
    luma = rng.randint(0, 256, (n, 64, 64)).astype(np.uint8)
    depth4 = rng.randint(0, 4, (n, 4, 4)).astype(np.uint8)
    qp = np.full((n,), 32, np.uint8)

    ck = str(tmp_path / "state.npz")
    cfg = train_cnn.TrainConfig(iters=6, eval_every=2, batch_size=16,
                                eval_batch=64, log=False, ckpt_path=ck)
    params_full, hist_full = train_cnn.train(luma, qp, depth4, cfg)

    # interrupted at iter 2 (checkpoint written at eval point), resume
    cfg_short = train_cnn.TrainConfig(iters=2, eval_every=2, batch_size=16,
                                      eval_batch=64, log=False, ckpt_path=ck)
    train_cnn.train(luma, qp, depth4, cfg_short)
    params_res, hist_res = train_cnn.train(luma, qp, depth4, cfg,
                                           resume_from=ck)
    assert [h["iter"] for h in hist_res] == [h["iter"] for h in hist_full]
    assert hist_res[0]["iter"] == 2   # replayed from the checkpoint

    # NaN guard: a batch whose labels are NaN must not poison params
    import jax
    import jax.numpy as jnp
    import optax
    p0 = train_cnn.eth_cnn.init_params(jax.random.PRNGKey(0))
    tx = optax.chain(optax.clip_by_global_norm(10.0),
                     optax.sgd(0.01, momentum=0.9))
    st = tx.init(p0)
    step = train_cnn.make_train_step(tx)
    bad = np.full((8, 4, 4), np.nan, np.float32)
    p1, st1, loss, _ = step(p0, st, jnp.asarray(luma[:8]),
                            jnp.asarray(qp[:8].astype(np.float32)),
                            jnp.asarray(bad), jax.random.PRNGKey(1))
    assert not np.isfinite(float(loss))
    for k in p0:
        np.testing.assert_array_equal(np.asarray(p1[k]), np.asarray(p0[k]))

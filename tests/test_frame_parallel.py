"""Frame-parallel (multi-device) AI encoding on the virtual 8-CPU mesh."""

import numpy as np
import pytest

from hevc_tpu.entropy import headers
from hevc_tpu.evaltools import hm
from hevc_tpu.parallel import frames as pframes
from hevc_tpu.parallel.mesh import make_mesh
from hevc_tpu.pipeline.ai import AIEncoder

from tests.test_e2e_bitstream import synth_frame


def test_frame_parallel_matches_single_device():
    cfg = headers.EncoderConfig(width=64, height=64, qp=32)
    frames = [synth_frame(64, 64, seed=s) for s in range(8)]

    mesh = make_mesh(8, model_axis=1)
    penc = pframes.FrameParallelAI(cfg, mesh)
    pstream, _ = penc.encode(frames)

    senc = AIEncoder(cfg)
    sstream, _, _ = senc.encode(frames)
    assert pstream == sstream


@pytest.mark.skipif(not hm.decoder_available(), reason="HM decoder missing")
def test_frame_parallel_hm_decodes(tmp_path):
    cfg = headers.EncoderConfig(width=128, height=64, qp=27)
    frames = [synth_frame(128, 64, seed=s) for s in range(4)]
    mesh = make_mesh(4, model_axis=1)
    penc = pframes.FrameParallelAI(cfg, mesh)
    stream, _ = penc.encode(frames)
    rc, log, rec = hm.decode_bytes(stream, str(tmp_path))
    assert rc == 0, log
    assert "mismatch" not in log.lower(), log


def test_frame_parallel_tu_backend_matches():
    # equal mode space: the TU backend has no NxN support
    cfg = headers.EncoderConfig(width=64, height=64, qp=32, nxn=False)
    frames = [synth_frame(64, 64, seed=s) for s in range(4)]
    mesh = make_mesh(4, model_axis=1)
    p_tu = pframes.FrameParallelAI(cfg, mesh, recon_backend="tu")
    s_tu, _ = p_tu.encode(frames)
    p_ctu = pframes.FrameParallelAI(cfg, mesh)
    s_ctu, _ = p_ctu.encode(frames)
    assert s_tu == s_ctu


def test_chunked_pipeline_matches_batch():
    """Overlapped (chunked) encode is byte-identical to one-shot."""
    cfg = headers.EncoderConfig(width=64, height=64, qp=32)
    frames = [synth_frame(64, 64, seed=s) for s in range(8)]
    mesh = make_mesh(4, model_axis=1)
    penc = pframes.FrameParallelAI(cfg, mesh)
    s_batch, _ = penc.encode(frames)
    s_chunk, stats = penc.encode(frames, chunk=4)
    assert s_batch == s_chunk
    assert stats["entropy_s"] > 0


def test_ldp_multi_device():
    """ChainParallelLDP (GOP-chain pipeline parallelism over the 'data'
    axis, resident LSTM state sharded chain-major) is byte-identical to
    encoding each IDR-delimited chain with the sequential LDPEncoder."""
    from hevc_tpu.entropy import headers as hdr
    from hevc_tpu.models import eth_lstm
    from hevc_tpu.pipeline.pframe import LDPEncoder

    cfg = headers.EncoderConfig(width=128, height=64, qp=32, num_refs=2)
    rng = np.random.RandomState(11)
    base = rng.randint(0, 256, (64, 128)).astype(np.uint8)
    frames = []
    from hevc_tpu.core.yuv import Frame
    for t in range(8):
        y = np.roll(base, t, axis=1).copy()
        y[20:36, 40:72] = rng.randint(0, 256, (16, 32))
        cb = np.full((32, 64), 120, np.uint8)
        frames.append(Frame(y, cb, cb.copy()))

    import jax
    lstm = eth_lstm.init_params(jax.random.PRNGKey(0))
    L = 2
    mesh = make_mesh(4, model_axis=1)
    par = pframes.ChainParallelLDP(cfg, mesh, lstm_params=lstm)
    pstream, precons = par.encode(frames, intra_period=L)

    hdr_len = len(hdr.write_vps(cfg) + hdr.write_sps(cfg)
                  + hdr.write_pps(cfg))
    expected = pstream[:hdr_len]
    erecons = []
    for c in range(len(frames) // L):
        enc = LDPEncoder(cfg, lstm_params=lstm)
        s, r = enc.encode(frames[c * L:(c + 1) * L], with_hash_sei=False)
        expected += s[hdr_len:]
        erecons.extend(r)
    assert pstream[:hdr_len] == s[:hdr_len]
    assert pstream == expected
    for i, (a, b) in enumerate(zip(precons, erecons)):
        np.testing.assert_array_equal(a.y, b.y, err_msg=f"frame {i}")


def test_bucketed_max_depth_stream_identical():
    """Frame-bucketed max-depth narrowing (gated decide dispatched to
    shallower compiled programs per frame) is stream-identical to the
    full-depth gated pipeline."""
    import jax
    from hevc_tpu.models import eth_cnn

    cfg = headers.EncoderConfig(width=128, height=64, qp=32)
    params = eth_cnn.init_params(jax.random.PRNGKey(3))
    frames = [synth_frame(128, 64, seed=60 + i) for i in range(4)]
    mesh = make_mesh(4, model_axis=1)
    full = pframes.FrameParallelAI(cfg, mesh, cnn_params=params,
                                   bucket_max_depth=False)
    buck = pframes.FrameParallelAI(cfg, mesh, cnn_params=params,
                                   bucket_max_depth=True, decide_chunk=2)
    sf, _ = full.encode(frames, with_hash_sei=False)
    sb, _ = buck.encode(frames, with_hash_sei=False)
    assert sf == sb

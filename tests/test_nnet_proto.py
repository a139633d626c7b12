"""Tests for the nnet proto generators (tools/make_nnet_proto.py, the
reference kaldi/utils/nnet/make_*_proto.py role) and the in-framework
proto realizer (models/proto.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_kaldi_asr_tpu.models.proto import (
    apply_proto,
    init_proto,
    parse_proto,
    proto_output_dim,
)
from pytorch_kaldi_asr_tpu.tools.make_nnet_proto import (
    cnn_proto,
    dnn_proto,
    lstm_proto,
    main,
)


def test_dnn_proto_structure():
    text = dnn_proto(440, 1500, 3, 1024)
    lines = text.strip().splitlines()
    assert lines[0] == "<NnetProto>" and lines[-1] == "</NnetProto>"
    affines = [l for l in lines if l.startswith("<AffineTransform>")]
    assert len(affines) == 4  # 3 hidden + output
    sigmoids = [l for l in lines if l.startswith("<Sigmoid>")]
    assert len(sigmoids) == 3
    assert any(l.startswith("<Softmax>") for l in lines)
    # dims chain correctly
    assert "<InputDim> 440" in affines[0]
    assert "<OutputDim> 1500" in affines[-1]


def test_dnn_proto_bottleneck():
    text = dnn_proto(440, 1500, 2, 1024, bottleneck_dim=40)
    assert "<LinearTransform> <InputDim> 1024 <OutputDim> 40" in text
    assert "<LearnRateCoef> 0.1" in text


def test_lstm_blstm_protos():
    t = lstm_proto(43, 2000, num_layers=2)
    assert t.count("<LstmProjectedStreams>") == 2
    assert "<CellDim> 800" in t
    b = lstm_proto(43, 2000, bidirectional=True)
    assert "<BLstmProjectedStreams>" in b
    assert "<OutputDim> 1024" in b  # 2 * proj_dim


def test_cnn_proto():
    t = cnn_proto(40, 1500)
    assert "<ConvolutionalComponent>" in t
    assert "<MaxPoolingComponent>" in t
    assert "<Softmax>" in t


def test_cli(capsys):
    assert main(["dnn", "120", "300", "2", "256"]) == 0
    out = capsys.readouterr().out
    assert out.startswith("<NnetProto>")
    assert main(["blstm", "40", "300"]) == 0
    assert main(["cnn", "40", "300"]) == 0


def test_proto_realizes_as_jax_model():
    text = dnn_proto(20, 30, 2, 64, with_dropout=0.2)
    comps = parse_proto(text)
    params = init_proto(jax.random.PRNGKey(0), comps)
    x = jnp.array(np.random.RandomState(0).randn(3, 7, 20), jnp.float32)
    y = apply_proto(params, comps, x)
    assert y.shape == (3, 7, 30)
    # softmax output sums to 1
    np.testing.assert_allclose(np.asarray(y.sum(-1)), 1.0, rtol=1e-5)
    assert proto_output_dim(comps) == 30
    # train mode with dropout rng runs and differs from eval
    y2 = apply_proto(params, comps, x, train=True,
                     rng=jax.random.PRNGKey(1))
    assert not np.allclose(np.asarray(y), np.asarray(y2))


def test_proto_model_is_trainable():
    text = dnn_proto(10, 5, 1, 32)
    comps = parse_proto(text)
    params = init_proto(jax.random.PRNGKey(0), comps)
    rs = np.random.RandomState(1)
    x = jnp.array(rs.randn(50, 10), jnp.float32)
    labels = jnp.array(rs.randint(0, 5, 50))

    def loss_fn(p):
        probs = apply_proto(p, comps, x)
        return -jnp.log(probs[jnp.arange(50), labels] + 1e-8).mean()

    l0 = float(loss_fn(params))
    for _ in range(20):
        g = jax.grad(loss_fn)(params)
        params = jax.tree_util.tree_map(lambda p, gr: p - 0.5 * gr, params,
                                        g)
    assert float(loss_fn(params)) < l0


def test_unsupported_component_raises():
    comps = parse_proto(lstm_proto(40, 100))
    with pytest.raises(ValueError, match="encoder zoo"):
        init_proto(jax.random.PRNGKey(0), comps)


def test_splice_component():
    comps = parse_proto(
        "<NnetProto>\n<Splice> <InputDim> 4 <OutputDim> 12 "
        "<Context> -1:0:1\n</NnetProto>\n")
    params = init_proto(jax.random.PRNGKey(0), comps)
    x = jnp.arange(2 * 5 * 4, dtype=jnp.float32).reshape(2, 5, 4)
    y = apply_proto(params, comps, x)
    assert y.shape == (2, 5, 12)


def test_splice_clamps_at_edges():
    """nnet1 splice repeats edge frames; a circular shift would leak the
    far end of the utterance into the edge context slots."""
    comps = parse_proto(
        "<NnetProto>\n<Splice> <InputDim> 2 <OutputDim> 6 "
        "<Context> -1:0:1\n</NnetProto>\n")
    params = init_proto(jax.random.PRNGKey(0), comps)
    x = jnp.arange(1 * 4 * 2, dtype=jnp.float32).reshape(1, 4, 2)
    y = np.asarray(apply_proto(params, comps, x))
    # frame 0: left context slot must repeat frame 0, not wrap to frame 3
    np.testing.assert_array_equal(y[0, 0, 0:2], np.asarray(x)[0, 0])
    np.testing.assert_array_equal(y[0, 0, 2:4], np.asarray(x)[0, 0])
    np.testing.assert_array_equal(y[0, 0, 4:6], np.asarray(x)[0, 1])
    # last frame: right context slot repeats the last frame, no wrap to 0
    np.testing.assert_array_equal(y[0, -1, 0:2], np.asarray(x)[0, -2])
    np.testing.assert_array_equal(y[0, -1, 2:4], np.asarray(x)[0, -1])
    np.testing.assert_array_equal(y[0, -1, 4:6], np.asarray(x)[0, -1])

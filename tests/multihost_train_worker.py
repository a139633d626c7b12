"""Worker process for the launcher-driven two-process TRAINING test
(tests/test_multihost_e2e.py).  This is the real multi-host data-parallel
story end to end (ROADMAP item 3): each process joins one
jax.distributed runtime, feeds its local shard of a global batch into the
SAME jitted train step the recipe uses (train.state.make_train_step with a
mesh spanning both hosts), and coordinates checkpointing — process 0
writes, everyone barriers, everyone reloads and verifies.

Invoked by parallel/launch.py as an array job (JOB=1:N), which is exactly
how a cluster recipe would drive it: the launcher substitutes JOB, the
worker derives its process id from it.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

from pytorch_kaldi_asr_tpu.models.transformer import (  # noqa: E402
    TransformerConfig,
    init_transformer,
)
from pytorch_kaldi_asr_tpu.parallel import multihost  # noqa: E402
from pytorch_kaldi_asr_tpu.train.checkpoint import (  # noqa: E402
    load_checkpoint,
    save_checkpoint,
)
from pytorch_kaldi_asr_tpu.train.state import (  # noqa: E402
    create_train_state,
    make_train_step,
)


def _cfg():
    return TransformerConfig(
        src_dim=13, vocab_size=11, encoder_max_len=16, decoder_max_len=8,
        decoder_sub_sequence=(-3, 0), en_layers=1, de_layers=1, n_head=2,
        en_d_model=16, de_d_model=16, d_k=8, d_v=8, en_dropout=0.0,
        de_dropout=0.0, tdnn_contexts=((-1, 0, 1),),
    )


def main():
    job = int(sys.argv[1])  # launcher JOB index, 1-based
    n, port, out_dir = int(sys.argv[2]), sys.argv[3], sys.argv[4]
    # gang-elasticity test hook: on the FIRST attempt (flag file absent)
    # the last rank dies mid-training; the --gang launcher must kill the
    # survivor and relaunch the whole array, which re-forms the
    # jax.distributed world on the SAME coordinator address
    die_flag = sys.argv[5] if len(sys.argv) > 5 else None
    pid = job - 1
    idx, cnt = multihost.initialize(
        coordinator=f"127.0.0.1:{port}", num_processes=n, process_id=pid)
    assert (idx, cnt) == (pid, n), (idx, cnt)

    from jax.experimental import multihost_utils

    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    cfg = _cfg()
    params = init_transformer(jax.random.PRNGKey(0), cfg)
    state, tx = create_train_state(params, start_lr=0.01,
                                   soft_coefficient=100.0)
    train_step = make_train_step(cfg, tx, mesh=mesh, donate=False)

    # one fixed global batch, identical on every process (seeded);
    # each process hands jax only the rows its local devices own
    b, s, t = 4 * jax.device_count(), 8, 6
    rng = np.random.default_rng(0)
    g_src = rng.normal(size=(b, s, cfg.src_dim)).astype(np.float32)
    g_src_mask = np.ones((b, s), np.uint8)
    g_tgt = rng.integers(3, cfg.vocab_size, size=(b, t)).astype(np.int32)
    g_tgt_mask = np.ones((b, t), np.uint8)

    shard = NamedSharding(mesh, P("data"))

    def to_global(a):
        per = a.shape[0] // cnt
        local = a[idx * per:(idx + 1) * per]
        return jax.make_array_from_process_local_data(shard, local, a.shape)

    src, src_mask = to_global(g_src), to_global(g_src_mask)
    tgt, tgt_mask = to_global(g_tgt), to_global(g_tgt_mask)

    losses = []
    for i in range(5):
        if (die_flag and not os.path.exists(die_flag) and pid == n - 1
                and i == 3):
            with open(die_flag, "w", encoding="utf-8") as f:
                f.write("died at step 3\n")
            print("MULTIHOST_TRAIN_DYING", flush=True)
            os._exit(1)  # simulated host loss mid-training
        state, metrics = train_step(state, src, src_mask, tgt, tgt_mask)
        losses.append(float(metrics["loss"]))  # replicated scalar
    assert losses[-1] < losses[0], losses

    # every process converged to the SAME weights (the gradient psum is a
    # cross-host collective): compare a parameter checksum across hosts
    checksum = float(
        sum(jnp.sum(jnp.abs(x)) for x in jax.tree_util.tree_leaves(
            jax.device_get(state.params))))
    all_sums = np.asarray(
        multihost_utils.process_allgather(np.float32(checksum)))
    assert np.allclose(all_sums, all_sums[0], rtol=1e-6), all_sums

    # checkpoint coordination: process 0 writes, everyone barriers, then
    # everyone reloads and verifies against its in-memory params
    ckpt = os.path.join(out_dir, "ckpt")
    params_host = jax.device_get(state.params)
    if idx == 0:
        save_checkpoint(ckpt, params_host, cfg, epoch=1,
                        step=int(state.step))
    multihost_utils.sync_global_devices("pka_ckpt_saved")
    loaded = load_checkpoint(ckpt)["params"]
    for a, b_ in zip(jax.tree_util.tree_leaves(params_host),
                     jax.tree_util.tree_leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))

    print(f"MULTIHOST_TRAIN_OK {idx}/{cnt} devices={jax.device_count()} "
          f"loss {losses[0]:.4f}->{losses[-1]:.4f}", flush=True)


if __name__ == "__main__":
    main()

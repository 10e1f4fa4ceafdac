"""Data-parallel pretraining over a device mesh.

Each device processes its own padded subgraph batch; params/optimizer state
are replicated.  Per step, under ``shard_map``:

  * gradients are pmean-ed over the ``data`` axis,
  * VQ codebook statistics (bins / embed_sum) are psum-ed inside
    ``vq_apply`` via ``axis_name`` — the analog of the reference's
    ``all_reduce_fn`` (STEM-GNN/model/vq.py:666,672),
  * BatchNorm batch statistics are psum-ed the same way, preserving
    single-chip numerics.

Inputs arrive as stacked Graph pytrees with a leading device axis
(``stack_graphs``), sharded ``P('data')``.
"""

from __future__ import annotations

import jax
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from stemgnn_tpu.core.config import PretrainConfig
from stemgnn_tpu.core.graph import Graph
from stemgnn_tpu.models.pretrain import ema_update_teacher, pretrain_forward
from stemgnn_tpu.train import augment


def stack_graphs(graphs) -> Graph:
    """Stack per-device Graphs into one pytree with a leading device axis."""
    return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *graphs)


def make_dp_pretrain_step(cfg: PretrainConfig, tx, mesh, *, bs: int,
                          axis: str = "data", indexed: bool = False):
    """Returns a jitted step:
    (params, teacher, opt_state, state, stacked_graph, rng[n_dev]) ->
    (params, teacher, opt_state, state, metrics).

    With ``indexed=True`` the stacked graph is an IndexedGraph pytree and
    the step takes trailing replicated (node_table, edge_table) arguments;
    features gather on device per shard.
    """

    def per_device(params, teacher, opt_state, state, g, rng,
                   node_table=None, edge_table=None):
        # shard_map passes shards with the device axis collapsed.
        g = jax.tree_util.tree_map(lambda x: x[0], g)
        rng = rng[0]
        if indexed:
            from stemgnn_tpu.core.graph import materialize_graph
            g = materialize_graph(g, node_table, edge_table)
        k_f, k_e, k_fwd = jax.random.split(rng, 3)
        aug_g = g.replace(
            node_feat=augment.mask_feature(k_f, g.node_feat, cfg.feat_p),
            edge_mask=augment.dropout_edges_undirected(
                k_e, g.senders, g.receivers, g.edge_mask, cfg.edge_p))

        def loss_fn(params):
            return pretrain_forward(params, teacher, state, cfg, aug_g, g,
                                    bs=bs, rng=k_fwd, training=True,
                                    axis_name=axis)

        (loss, (aux, new_state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        grads = jax.lax.pmean(grads, axis)
        # Replicated state must stay consistent: average the BN updates
        # produced from per-device batches (stats were already psum-ed
        # inside, so they are identical; pmean is a no-op safeguard).
        new_state = jax.lax.pmean(new_state, axis)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if cfg.vq.ema_update:
            from stemgnn_tpu.vq import adopt_ema_embed
            params = dict(params, vq=adopt_ema_embed(params["vq"],
                                                     new_state["vq"]))
        teacher = ema_update_teacher(teacher, params["encoder"],
                                     cfg.sem_encoder_decay)
        metrics = jax.lax.pmean(dict(aux["losses"], loss=loss), axis)
        return params, teacher, opt_state, new_state, metrics

    rep = P()
    shd = P(axis)
    in_specs = (rep, rep, rep, rep, shd, shd) + ((rep, rep) if indexed
                                                 else ())
    step = jax.shard_map(
        per_device, mesh=mesh,
        in_specs=in_specs,
        out_specs=(rep, rep, rep, rep, rep),
        check_vma=False)
    return jax.jit(step)


def make_dp_pretrain_loop_step(cfg: PretrainConfig, tx, mesh, *, bs: int,
                               axis: str = "data", indexed: bool = False):
    """Steady-state data-parallel loop step: carries the RNG key and a
    running metric sum inside the one jitted dispatch (the multi-device
    analog of train.pretrain_loop.make_pretrain_loop_step)."""
    import jax.numpy as jnp
    n_dev = int(mesh.shape[axis])
    dp = make_dp_pretrain_step(cfg, tx, mesh, bs=bs, axis=axis,
                               indexed=indexed)

    def loop_step(params, teacher, opt_state, state, g, key, metrics_sum,
                  node_table=None, edge_table=None):
        key, k = jax.random.split(key)
        rngs = jax.random.split(k, n_dev)
        args = (params, teacher, opt_state, state, g, rngs)
        if indexed:
            args = args + (node_table, edge_table)
        params, teacher, opt_state, state, metrics = dp(*args)
        metrics_sum = jax.tree_util.tree_map(jnp.add, metrics_sum, metrics)
        return params, teacher, opt_state, state, key, metrics_sum

    return jax.jit(loop_step)


def device_put_replicated(tree, mesh):
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def device_put_sharded_batch(tree, mesh, axis: str = "data"):
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)

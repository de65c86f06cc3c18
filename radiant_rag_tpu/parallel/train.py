"""Contrastive training of the bi-encoder under dp x tp sharding.

The reference has no training at all (it consumes frozen
sentence-transformers checkpoints, `local_models.py:61-135`). A TPU-native
retrieval framework owns its embedder, so fine-tuning is first-class: InfoNCE
with in-batch negatives (the standard sentence-embedding objective), jitted
over a ('data','model') mesh — batch sharded over 'data' (DP), attention/MLP
weight matrices sharded over 'model' (TP, Megatron-style pairing: column-split
qkv/mlp_in, row-split out/mlp_out so each block needs one reduce). GSPMD
inserts the ICI collectives from the NamedSharding annotations.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from radiant_rag_tpu.models.bert import BertConfig, BertEncoder, init_params, l2_normalize, mean_pool


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def param_partition_specs(params: Any) -> Any:
    """PartitionSpec tree for the BERT encoder under 'model'-axis TP.

    Megatron pairing: query/key/value/mlp_in kernels column-split
    (P(None, 'model')), out/mlp_out kernels row-split (P('model', None));
    embeddings + LayerNorms replicated.
    """

    def spec_for(path, leaf) -> P:
        names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
        joined = "/".join(str(n) for n in names)
        ndim = getattr(leaf, "ndim", 0)
        if ndim == 2:
            if any(k in joined for k in ("query/kernel", "key/kernel", "value/kernel", "mlp_in/kernel")):
                return P(None, "model")
            if any(k in joined for k in ("out/kernel", "mlp_out/kernel")):
                return P("model", None)
            return P(None, None)  # embeddings etc. replicated
        if ndim == 1:
            if any(k in joined for k in ("query/bias", "key/bias", "value/bias", "mlp_in/bias")):
                return P("model")
            return P(None)
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def info_nce_loss(model: BertEncoder, params, batch: Dict[str, jax.Array],
                  temperature: float = 0.05) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Symmetric InfoNCE over in-batch negatives, plus optional mined hard
    negatives (batch keys n_ids/n_mask, (B*H, S)): hard negatives extend the
    q->d softmax columns to (B, B + B*H). In-batch negatives teach coarse
    topic separation; BM25-mined hard negatives (lexically close non-targets,
    `data.ContrastivePairSampler`) force the margin the hybrid fusion needs —
    a dense leg that only separates topics loses every within-topic query."""
    zq = l2_normalize(mean_pool(
        model.apply(params, batch["q_ids"], batch["q_mask"]), batch["q_mask"]))
    zd = l2_normalize(mean_pool(
        model.apply(params, batch["d_ids"], batch["d_mask"]), batch["d_mask"]))
    logits = (zq @ zd.T) / temperature  # (B, B); GSPMD all-gathers zd over dp
    labels = jnp.arange(logits.shape[0])
    if "n_ids" in batch:
        zn = l2_normalize(mean_pool(
            model.apply(params, batch["n_ids"], batch["n_mask"]), batch["n_mask"]))
        logits = jnp.concatenate([logits, (zq @ zn.T) / temperature], axis=1)
    loss_qd = optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
    loss_dq = optax.softmax_cross_entropy_with_integer_labels(
        logits[:, : zd.shape[0]].T, labels).mean()
    loss = 0.5 * (loss_qd + loss_dq)
    acc = jnp.mean(jnp.argmax(logits, axis=1) == labels)
    return loss, {"loss": loss, "accuracy": acc}


def make_train_state(
    cfg: BertConfig,
    mesh: Mesh,
    learning_rate: float = 2e-5,
    seed: int = 0,
    schedule_steps: int = 0,
    init_params_tree: Any = None,
) -> Tuple[TrainState, BertEncoder, optax.GradientTransformation, Any]:
    """Init params, place them with TP shardings on the mesh, build optimizer.

    schedule_steps > 0 enables linear-warmup (10%) + cosine decay to 10% of
    the peak LR over that many steps — long schedules (1k+) diverge or
    plateau early under constant LR. init_params_tree warm-starts from an
    existing parameter tree (continue training a checkpoint).
    Returns (state, model, optimizer, param_shardings)."""
    model = BertEncoder(cfg)
    params = init_params_tree if init_params_tree is not None else init_params(cfg, seed=seed)
    specs = param_partition_specs(params)
    shardings = jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                             is_leaf=lambda x: isinstance(x, P))
    params = jax.device_put(params, shardings)
    if schedule_steps > 0:
        warmup = max(1, schedule_steps // 10)
        lr = optax.warmup_cosine_decay_schedule(
            init_value=learning_rate * 0.01, peak_value=learning_rate,
            warmup_steps=warmup, decay_steps=schedule_steps,
            end_value=learning_rate * 0.1)
    else:
        lr = learning_rate
    tx = optax.adamw(lr)
    opt_state = tx.init(params)
    state = TrainState(params=params, opt_state=opt_state, step=jnp.zeros((), jnp.int32))
    return state, model, tx, shardings


def ce_pointwise_loss(model, params, batch: Dict[str, jax.Array]
                      ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Pointwise BCE for the cross-encoder reranker.

    batch: ids/mask/type_ids (B, S) tokenized (query, doc) pairs, labels
    (B,) in {0,1}. The reference consumes a frozen ms-marco cross-encoder
    (`llm/local_models.py:251-281`); this framework owns its reranker, so
    it trains one the same way the bi-encoder is trained — from the indexed
    corpus itself, positives = pseudo-queries of the target doc, negatives =
    BM25 hard negatives + random docs (`data.CrossEncoderPairSampler`)."""
    logits = model.apply(params, batch["ids"], batch["mask"], batch["type_ids"])
    labels = batch["labels"].astype(jnp.float32)
    loss = optax.sigmoid_binary_cross_entropy(logits, labels).mean()
    acc = jnp.mean((logits > 0) == (labels > 0.5))
    return loss, {"loss": loss, "accuracy": acc}


def make_ce_train_state(
    cfg: BertConfig,
    mesh: Mesh,
    learning_rate: float = 2e-5,
    seed: int = 0,
    schedule_steps: int = 0,
    init_params_tree: Any = None,
):
    """Cross-encoder analog of make_train_state: init CrossEncoderModel
    params (BERT + pooler + 1-logit classifier), TP-shard the BERT blocks
    via the same Megatron pairing (param paths keep their query/mlp_in/...
    suffixes under the 'bert' scope, so param_partition_specs applies
    unchanged; pooler/classifier are tiny and replicate).
    Returns (state, model, tx, shardings)."""
    from radiant_rag_tpu.models.cross_encoder import CrossEncoderModel

    model = CrossEncoderModel(cfg)
    if init_params_tree is not None:
        params = init_params_tree
    else:
        rng = jax.random.PRNGKey(seed)
        dummy = jnp.zeros((1, 8), jnp.int32)
        params = model.init(rng, dummy, jnp.ones((1, 8), jnp.int32), dummy)
    specs = param_partition_specs(params)
    shardings = jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                             is_leaf=lambda x: isinstance(x, P))
    params = jax.device_put(params, shardings)
    if schedule_steps > 0:
        warmup = max(1, schedule_steps // 10)
        lr = optax.warmup_cosine_decay_schedule(
            init_value=learning_rate * 0.01, peak_value=learning_rate,
            warmup_steps=warmup, decay_steps=schedule_steps,
            end_value=learning_rate * 0.1)
    else:
        lr = learning_rate
    tx = optax.adamw(lr)
    opt_state = tx.init(params)
    state = TrainState(params=params, opt_state=opt_state, step=jnp.zeros((), jnp.int32))
    return state, model, tx, shardings


def ce_listwise_loss(model, params, batch: Dict[str, jax.Array], group: int
                     ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Group-listwise softmax for the cross-encoder reranker.

    The batch is `n_groups` consecutive blocks of `group` pairs sharing one
    pseudo-query, positive FIRST in each block
    (`data.CrossEncoderPairSampler`). Softmax cross-entropy over each
    block's logits optimizes exactly what rerank needs — score the positive
    above ITS OWN query's negatives — and trains far faster from scratch
    than pointwise BCE, whose gradient is dominated by the easy
    class-balance solution (measured: BCE sat at chance accuracy for 3k
    steps on the 100k corpus; listwise separates within hundreds).
    accuracy = fraction of groups ranking the positive first (chance 1/G)."""
    logits = model.apply(params, batch["ids"], batch["mask"], batch["type_ids"])
    g = logits.reshape(-1, group)
    labels = jnp.zeros((g.shape[0],), jnp.int32)
    loss = optax.softmax_cross_entropy_with_integer_labels(g, labels).mean()
    acc = jnp.mean(jnp.argmax(g, axis=1) == 0)
    return loss, {"loss": loss, "accuracy": acc}


def cross_encoder_train_step(model, tx: optax.GradientTransformation, mesh: Mesh,
                             loss: str = "listwise", group: int = 4):
    """Jitted dp x tp training step for the cross-encoder.

    loss="listwise" (default): 1-of-`group` softmax per query block;
    loss="pointwise": per-pair BCE on the labels field."""
    batch_sharding = NamedSharding(mesh, P("data", None))
    scalar_sharding = NamedSharding(mesh, P("data"))

    def loss_fn(p, batch):
        if loss == "listwise":
            return ce_listwise_loss(model, p, batch, group)
        return ce_pointwise_loss(model, p, batch)

    @partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch: Dict[str, jax.Array]):
        (loss_v, metrics), grads = jax.value_and_grad(
            lambda p: loss_fn(p, batch), has_aux=True
        )(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), metrics

    def place_batch(batch: Dict[str, Any]) -> Dict[str, jax.Array]:
        out = {}
        for k, v in batch.items():
            arr = jnp.asarray(v)
            out[k] = jax.device_put(
                arr, scalar_sharding if arr.ndim == 1 else batch_sharding)
        return out

    return step, place_batch


def contrastive_train_step(
    model: BertEncoder,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    temperature: float = 0.05,
):
    """Build the jitted dp x tp training step for `model` on `mesh`.

    Batch arrays are sharded P('data', None); everything else falls out of the
    param shardings via GSPMD propagation."""
    batch_sharding = NamedSharding(mesh, P("data", None))

    @partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch: Dict[str, jax.Array]):
        (loss, metrics), grads = jax.value_and_grad(
            lambda p: info_nce_loss(model, p, batch, temperature), has_aux=True
        )(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), metrics

    def place_batch(batch: Dict[str, Any]) -> Dict[str, jax.Array]:
        return {k: jax.device_put(jnp.asarray(v), batch_sharding) for k, v in batch.items()}

    return step, place_batch

"""jitted train / eval steps.

The training iteration of the reference trainer
(`torchie/trainer/trainer.py:358-436` batch_processor_inline +
`hooks/optimizer.py:15-21` backward/clip/step) collapses into one compiled
function: forward, loss, grad, clip, optimizer update, BN-stat update. Under
a data-parallel mesh the batch arrives sharded on 'dp'; XLA inserts the
gradient all-reduce (the DDP equivalent) and the global BN reductions
(the apex-syncBN equivalent) automatically.
"""

import jax
import jax.numpy as jnp


def make_train_step(model, tx, train_cfg, rng_seed=0):
    base_key = jax.random.PRNGKey(rng_seed)

    def train_step(state, batch):
        step_key = jax.random.fold_in(base_key, state.step)
        k_drop, k_samp = jax.random.split(step_key)

        def loss_fn(params):
            preds, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["points"],
                batch["points_mask"],
                gt_boxes_and_cls=batch.get("gt_boxes_and_cls"),
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": k_drop, "sampler": k_samp},
            )
            losses = model.loss(batch, preds, train_cfg)
            total = jnp.asarray(0.0, jnp.float32)
            for l in losses["loss"]:
                total = total + l
            return total, (mutated["batch_stats"], losses)

        (loss, (new_bs, losses)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        new_state = state.apply_gradients(tx, grads, new_bs)

        metrics = {"loss": loss}
        # every per-task scalar the loss dict carries (any *_loss list plus
        # num_positive) is logged — no whitelist to fall out of date when a
        # head adds a new loss term
        for k, vals in losses.items():
            if k != "loss" and (k.endswith("_loss") or k == "num_positive"):
                for t, v in enumerate(vals):
                    metrics[f"{k}_task{t}"] = v
        metrics["grad_norm"] = jax.tree_util.tree_reduce(
            lambda a, g: a + jnp.sum(jnp.square(g)), grads, jnp.asarray(0.0)
        ) ** 0.5
        return new_state, metrics

    return train_step


def make_eval_step(model, test_cfg):
    def eval_step(state, batch):
        preds = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["points"],
            batch["points_mask"],
            train=False,
        )
        return model.predict(batch, preds, test_cfg)

    return eval_step

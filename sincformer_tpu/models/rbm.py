"""RBM layer-wise pretraining via jitted Contrastive Divergence.

Same CD-k algorithm as the reference (``models/rbm.py``: Gibbs sampling with
sigmoid units, ΔW = lr·(<vh>_data − <vh>_recon)/B) but the whole epoch is a
``lax.scan`` over minibatches on device — positive/negative phase outer
products are (B, vis)ᵀ×(B, hid) GEMMs on the MXU, instead of NumPy on host
(rbm.py:89-124).
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sincformer_tpu import config as cfg


class RBM:
    """Bernoulli-Bernoulli RBM with CD-k (reference rbm.py:21-187)."""

    def __init__(self, n_visible: int, n_hidden: int,
                 learning_rate: float | None = None, k_steps: int | None = None,
                 seed: int = 0, rcfg: cfg.RBMConfig = cfg.DEFAULT.rbm):
        self.n_visible = n_visible
        self.n_hidden = n_hidden
        self.lr = learning_rate or rcfg.learning_rate
        self.k = k_steps or rcfg.k_steps
        self.rcfg = rcfg
        key = jax.random.PRNGKey(seed)
        self.W = 0.01 * jax.random.normal(key, (n_visible, n_hidden),
                                          jnp.float32)
        self.v_bias = jnp.zeros(n_visible, jnp.float32)
        self.h_bias = jnp.zeros(n_hidden, jnp.float32)

    # functional core ------------------------------------------------------

    @staticmethod
    def _sample_hidden(params, v, key):
        w, _vb, hb = params
        prob = jax.nn.sigmoid(jnp.clip(v @ w + hb, -500, 500))
        sample = (prob > jax.random.uniform(key, prob.shape)).astype(jnp.float32)
        return prob, sample

    @staticmethod
    def _sample_visible(params, h, key):
        w, vb, _hb = params
        prob = jax.nn.sigmoid(jnp.clip(h @ w.T + vb, -500, 500))
        sample = (prob > jax.random.uniform(key, prob.shape)).astype(jnp.float32)
        return prob, sample

    def _cd_step(self, params, v_data, key, lr, k):
        """One CD-k update (reference rbm.py:89-124). Returns new params and
        reconstruction error."""
        b = v_data.shape[0]
        keys = jax.random.split(key, 2 * k + 1)
        pos_h_prob, h_sample = self._sample_hidden(params, v_data, keys[0])
        pos_assoc = v_data.T @ pos_h_prob
        neg_v_prob = v_data
        for i in range(k):
            neg_v_prob, _ = self._sample_visible(params, h_sample,
                                                 keys[1 + 2 * i])
            neg_h_prob, h_sample = self._sample_hidden(params, neg_v_prob,
                                                       keys[2 + 2 * i])
        neg_assoc = neg_v_prob.T @ neg_h_prob
        w, vb, hb = params
        w = w + lr * (pos_assoc - neg_assoc) / b
        vb = vb + lr * jnp.mean(v_data - neg_v_prob, axis=0)
        hb = hb + lr * jnp.mean(pos_h_prob - neg_h_prob, axis=0)
        err = jnp.mean((v_data - neg_v_prob) ** 2)
        return (w, vb, hb), err

    # public API -----------------------------------------------------------

    def sample_hidden(self, v, key=None):
        key = key if key is not None else jax.random.PRNGKey(0)
        return self._sample_hidden((self.W, self.v_bias, self.h_bias),
                                   jnp.asarray(v, jnp.float32), key)

    def sample_visible(self, h, key=None):
        key = key if key is not None else jax.random.PRNGKey(0)
        return self._sample_visible((self.W, self.v_bias, self.h_bias),
                                    jnp.asarray(h, jnp.float32), key)

    def contrastive_divergence(self, v_data, key=None):
        key = key if key is not None else jax.random.PRNGKey(
            np.random.randint(1 << 30))
        params, err = self._cd_step((self.W, self.v_bias, self.h_bias),
                                    jnp.asarray(v_data, jnp.float32), key,
                                    self.lr, self.k)
        self.W, self.v_bias, self.h_bias = params
        return float(err)

    def train(self, data, epochs: int | None = None,
              batch_size: int | None = None, verbose: bool = True,
              seed: int = 0) -> List[float]:
        """Train with CD-k: shuffled minibatch epochs, whole epoch scanned on
        device (reference rbm.py:126-165)."""
        epochs = epochs or self.rcfg.epochs
        batch_size = batch_size or self.rcfg.batch_size
        data = jnp.asarray(data, jnp.float32)
        n = data.shape[0]
        batch_size = min(batch_size, n)
        n_batches = max(1, n // batch_size)
        usable = n_batches * batch_size

        cd = self._cd_step
        lr, k = self.lr, self.k

        @jax.jit
        def epoch_fn(params, batches, key):
            keys = jax.random.split(key, batches.shape[0])

            def body(p, xs):
                batch, kk = xs
                p, err = cd(p, batch, kk, lr, k)
                return p, err

            params, errs = jax.lax.scan(body, params, (batches, keys))
            return params, jnp.mean(errs)

        params = (self.W, self.v_bias, self.h_bias)
        errors = []
        rng = np.random.default_rng(seed)
        for epoch in range(epochs):
            perm = rng.permutation(n)[:usable]
            batches = data[perm].reshape(n_batches, batch_size, -1)
            params, err = epoch_fn(params, batches,
                                   jax.random.PRNGKey(seed * 1000 + epoch))
            errors.append(float(err))
            if verbose:
                print(f"  RBM Epoch {epoch + 1}/{epochs}: "
                      f"Reconstruction Error = {errors[-1]:.6f}")
        self.W, self.v_bias, self.h_bias = params
        return errors

    def transform(self, data, key=None):
        """Hidden probabilities for stacking (rbm.py:167-179)."""
        prob, _ = self.sample_hidden(data, key)
        return prob

    def get_weights(self):
        return (np.asarray(self.W), np.asarray(self.v_bias),
                np.asarray(self.h_bias))


def pretrain_dnn_with_rbm(data, layer_sizes: List[int],
                          verbose: bool = True, seed: int = 0):
    """Stacked layer-wise RBM pretraining (reference rbm.py:190-223)."""
    rbm_weights = []
    current = jnp.asarray(data, jnp.float32)
    for i in range(len(layer_sizes) - 1):
        if verbose:
            print(f"\n--- RBM Layer {i + 1}: {layer_sizes[i]} → "
                  f"{layer_sizes[i + 1]} ---")
        rbm = RBM(layer_sizes[i], layer_sizes[i + 1], seed=seed + i)
        rbm.train(current, verbose=verbose, seed=seed + i)
        rbm_weights.append(rbm.get_weights())
        current = rbm.transform(current)
    return rbm_weights

"""PSO + full OPT-PCIRM optimization path (reference tests/test_pso.py
coverage + the on-device vmapped fitness sweep)."""

import numpy as np
import pytest

import jax.numpy as jnp

from sincformer_tpu.data import add_noise_at_snr, synthetic_noise, synthetic_speech
from sincformer_tpu.masks import compute_opt_pcirm, compute_snr_boundaries
from sincformer_tpu.optim import ParticleSwarmOptimizer


class TestPSO:
    def test_quadratic_optimum(self):
        pso = ParticleSwarmOptimizer(
            batched_fitness=lambda xs: -(np.asarray(xs) - 0.3) ** 2,
            num_particles=20, max_iter=50, maximize=True)
        best_x, best_f = pso.optimize(rng=np.random.default_rng(0))
        assert abs(best_x - 0.3) < 0.05

    def test_bounds_respected(self):
        seen = []

        def fit(xs):
            seen.append(np.asarray(xs).copy())
            return np.asarray(xs)

        pso = ParticleSwarmOptimizer(batched_fitness=fit, num_particles=10,
                                     max_iter=20, bounds=(0.2, 0.8))
        best_x, _ = pso.optimize(rng=np.random.default_rng(1))
        allx = np.concatenate(seen)
        assert np.all(allx >= 0.2 - 1e-9) and np.all(allx <= 0.8 + 1e-9)
        assert 0.2 <= best_x <= 0.8

    def test_gbest_monotone(self):
        pso = ParticleSwarmOptimizer(
            batched_fitness=lambda xs: np.sin(np.asarray(xs) * 7),
            num_particles=10, max_iter=30)
        pso.optimize(rng=np.random.default_rng(2))
        h = pso.get_convergence_history()["gbest_fitness"]
        assert all(h[i + 1] >= h[i] - 1e-12 for i in range(len(h) - 1))
        assert len(pso.get_convergence_history()["gbest_position"]) == len(h)

    def test_scalar_fitness_api(self):
        """Reference-style scalar fitness_fn also works."""
        pso = ParticleSwarmOptimizer(fitness_fn=lambda x: -(x - 0.6) ** 2,
                                     num_particles=8, max_iter=20)
        best_x, _ = pso.optimize(rng=np.random.default_rng(3))
        assert abs(best_x - 0.6) < 0.1

    def test_minimize_mode(self):
        pso = ParticleSwarmOptimizer(
            batched_fitness=lambda xs: (np.asarray(xs) - 0.4) ** 2,
            num_particles=15, max_iter=40, maximize=False)
        best_x, best_f = pso.optimize(rng=np.random.default_rng(4))
        assert abs(best_x - 0.4) < 0.05
        assert best_f < 0.01


class TestOptPCIRMFullPath:
    def test_pso_optimized_mask(self):
        """The full paper loop: PCIRM → PSO(vmapped STOI fitness) →
        quantized mask. ~3000 serial STOI evals in the reference
        (opt_pcirm.py:146-183) — here batched over the swarm."""
        clean = synthetic_speech(1.0)
        noise = synthetic_noise(len(clean), seed=1)
        noisy = add_noise_at_snr(clean, noise, 0)
        rng = np.random.default_rng(5)
        pcirm = rng.uniform(0, 1, (64, (len(clean) - 160) // 80 + 1))

        mask, steps, middle = compute_opt_pcirm(
            pcirm, noisy, clean, use_pso=True,
            pso_config={"num_particles": 8, "max_iter": 5},
            rng=np.random.default_rng(6))
        assert 0.0 <= middle <= 1.0
        uniq = np.unique(np.round(np.asarray(mask), 5))
        assert len(uniq) <= 3
        # quantized values are a subset of {s1, middle, s3} (f32 tolerance)
        expected = np.array([steps[0], middle, steps[2]])
        for u in uniq:
            assert np.any(np.isclose(u, expected, atol=1e-4)), (u, expected)

    def test_fixed_steps_path(self):
        rng = np.random.default_rng(7)
        pcirm = rng.uniform(0, 1, (64, 20))
        mask, steps, middle = compute_opt_pcirm(pcirm, use_pso=False)
        assert middle == steps[1]
        assert len(np.unique(np.round(np.asarray(mask), 6))) <= 3

    def test_full_stoi_fitness(self):
        """PSO with the Taal-2011 device STOI as fitness."""
        clean = synthetic_speech(1.0)
        noise = synthetic_noise(len(clean), seed=2)
        noisy = add_noise_at_snr(clean, noise, 0)
        rng = np.random.default_rng(8)
        pcirm = rng.uniform(0, 1, (64, (len(clean) - 160) // 80 + 1))
        mask, steps, middle = compute_opt_pcirm(
            pcirm, noisy, clean, use_pso=True, fitness="full",
            pso_config={"num_particles": 6, "max_iter": 3},
            rng=np.random.default_rng(9))
        assert 0.0 <= middle <= 1.0
        assert len(np.unique(np.round(np.asarray(mask), 5))) <= 3

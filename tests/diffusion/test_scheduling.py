import numpy as np
import jax.numpy as jnp

from vllm_omni_tpu.diffusion import scheduling


def test_sigmas_linspace_and_shift():
    s = scheduling.set_timesteps(10)
    sig = np.asarray(s.sigmas)
    assert sig.shape == (11,)
    assert abs(sig[0] - 1.0) < 1e-6
    assert abs(sig[-2] - 0.1) < 1e-6
    assert sig[-1] == 0.0
    np.testing.assert_allclose(np.asarray(s.timesteps), sig[:-1] * 1000, rtol=1e-6)

    # dynamic shift pushes sigmas up for mu > 0
    s2 = scheduling.set_timesteps(10, mu=1.0)
    sig2 = np.asarray(s2.sigmas)
    assert (sig2[1:-1] > sig[1:-1]).all()

    # static shift identity at shift=1
    s3 = scheduling.set_timesteps(10, shift=1.0)
    np.testing.assert_allclose(np.asarray(s3.sigmas), sig, rtol=1e-6)


def test_calculate_shift_endpoints():
    assert abs(scheduling.calculate_shift(256) - 0.5) < 1e-9
    assert abs(scheduling.calculate_shift(4096) - 1.15) < 1e-9


def test_euler_step_integrates_linear_flow():
    # velocity constant v: x(sigma=0) = x(1) - v (integrating over sigma)
    x0 = jnp.ones((1, 4, 8)) * 2.0
    v = jnp.ones((1, 4, 8)) * 0.5
    s = scheduling.set_timesteps(20)
    x = x0
    for i in range(20):
        x = scheduling.step(x, v, s.sigmas[i], s.sigmas[i + 1])
    np.testing.assert_allclose(np.asarray(x), 2.0 - 0.5, atol=1e-5)


def test_add_noise_endpoints():
    clean = jnp.ones((2, 3))
    noise = jnp.zeros((2, 3))
    np.testing.assert_allclose(
        np.asarray(scheduling.add_noise(clean, noise, jnp.float32(0.0))), 1.0)
    np.testing.assert_allclose(
        np.asarray(scheduling.add_noise(clean, noise, jnp.float32(1.0))), 0.0)

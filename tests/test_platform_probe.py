import jax

def test_platform():
    print("\nplatform:", jax.default_backend(), "ndev:", len(jax.devices()))
    assert jax.default_backend() == "cpu"
    assert len(jax.devices()) == 8

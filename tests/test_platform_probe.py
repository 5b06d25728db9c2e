import jax

def test_platform():
    print("\nplatform:", jax.default_backend(), "ndev:", len(jax.devices()))
    assert jax.default_backend() == "cpu"
    assert len(jax.devices()) == 8


def test_dryrun_xla_flags_pinned():
    """__graft_entry__.py's XLA flag list keys the committed .dryrun_cache:
    silent drift re-keys the persistent compile cache and turns the driver's
    warm 166 s multichip dryrun into a ~25 min cold compile (timeout). This
    pin fails on ANY flag edit; to change the flags, re-warm .dryrun_cache
    (run dryrun_multichip once with the new flags, commit the cache) and
    update the hash here in the same commit. VERDICT r3 next #8.

    Parsed from source (ast), not imported — importing __graft_entry__
    mutates XLA_FLAGS for this process.
    """
    import ast
    import hashlib
    import os

    src = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "__graft_entry__.py")
    tree = ast.parse(open(src).read())
    flags = None
    for node in ast.walk(tree):
        if isinstance(node, ast.Assign) \
                and any(getattr(t, "id", "") == "DRYRUN_XLA_FLAGS"
                        for t in node.targets):
            flags = tuple(ast.literal_eval(node.value))
    assert flags is not None, "DRYRUN_XLA_FLAGS constant missing"
    digest = hashlib.sha256(" ".join(flags).encode()).hexdigest()
    assert digest == ("b4462bb856d252d6ba805b89482c087cca9c0d41"
                      "a968f0b5f8ecd616a3d2086a"), (
        "dryrun XLA flags drifted — the committed .dryrun_cache is now cold "
        f"(flags: {flags}); re-warm the cache and update this pin together")

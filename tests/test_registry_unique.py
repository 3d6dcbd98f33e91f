"""Guard against registry-key shadowing: the QUERIES dict is built by
dict.update over ~20 wave dicts, so two waves registering the same
name silently drop the earlier query from the correctness gate while
everything stays green (caught live in round 10: a new wave re-used
'llm_repetition' and shadowed the round-3 entry).  Spark-free."""


def test_no_duplicate_registry_keys_across_waves():
    import lcmap_blackmagic_spark.registry as R

    waves = [(n, getattr(R, n)) for n in dir(R)
             if n.startswith("QUERIES_") and isinstance(getattr(R, n),
                                                        dict)]
    assert len(waves) >= 15          # the guard must see the waves
    seen: dict[str, str] = {}
    dups = []
    for wname, d in waves:
        for k in d:
            if k in seen:
                dups.append(f"{k!r} in {seen[k]} AND {wname}")
            else:
                seen[k] = wname
    assert not dups, (
        "registry keys registered by two waves (dict.update keeps "
        "only the last):\n" + "\n".join(dups))
    # every wave entry must actually be reachable in QUERIES
    assert set(seen) <= set(R.QUERIES)

"""Placeholder — filled in by the prover pipeline milestone."""


class CacheManager:  # pragma: no cover - placeholder
    pass


def groth16_prove(*a, **kw):  # pragma: no cover - placeholder
    raise NotImplementedError


def groth16_verify(*a, **kw):  # pragma: no cover - placeholder
    raise NotImplementedError

"""Process-environment helpers: shared-secret auth for the TCP services
and jax-platform pinning on boxes whose sitecustomize pre-boots a
backend plugin. Import-safe before jax initializes (jax is only imported
inside pin_platform_from_env)."""

from __future__ import annotations

import os


def resolve_secret(secret: str | None) -> str:
    """An explicit secret wins; otherwise the KWAGE_QUEUE_SECRET env var;
    empty string = auth disabled."""
    if secret is not None:
        return secret
    return os.environ.get("KWAGE_QUEUE_SECRET", "")


def check_token(msg: dict, secret: str) -> bool:
    """Pop the "token" field from a wire message and verify it against
    the shared secret (constant-time). True when auth is disabled or the
    token matches."""
    import hmac

    token = str(msg.pop("token", ""))
    if not secret:
        return True
    return hmac.compare_digest(token, secret)


def pin_platform_from_env() -> None:
    """Honor an explicit JAX_PLATFORMS request via jax.config.

    Some hosts boot a backend plugin from sitecustomize, which outranks
    the plain env var; applying the value through jax.config restores the
    standard semantics. Call BEFORE any other jax-touching import. No-op
    when JAX_PLATFORMS is unset."""
    if os.environ.get("JAX_PLATFORMS"):
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

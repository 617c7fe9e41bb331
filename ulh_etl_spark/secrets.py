"""Secret-alias resolution.

Config declares WHICH secret to use, never its value (the reference's
config references named secrets, practice_ingest_config.json:1297-1299
— and SURVEY §0 flags the places it failed to do so as the thing this
engine must not repeat). Aliases resolve from the environment here;
swap ``resolver`` for a real secret store (Key Vault, Secrets
Manager) without touching call sites.
"""

from __future__ import annotations

import os
from typing import Callable, Mapping


class SecretNotFound(KeyError):
    pass


def resolve_secret(
    alias: str,
    resolver: Mapping[str, str] | Callable[[str], str | None] = os.environ,
) -> str:
    """Resolve a secret alias to its value; raises SecretNotFound with
    the ALIAS (never a partial value) if absent."""
    value = resolver(alias) if callable(resolver) else resolver.get(alias)
    if value is None or value == "":
        raise SecretNotFound(f"secret alias {alias!r} is not set")
    return value


def resolve_practice_secrets(
    practice_secrets: dict[str, str],
    resolver: Mapping[str, str] | Callable[[str], str | None] = os.environ,
) -> dict[str, str]:
    """Resolve a practice's ``{name: alias}`` block into values,
    skipping documentation keys (non-alias entries like 'note')."""
    out = {}
    for name, alias in practice_secrets.items():
        if name == "note":
            continue
        out[name] = resolve_secret(alias, resolver)
    return out

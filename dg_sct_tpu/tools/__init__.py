"""One-command operational tools (checkpoint import, parity harnesses)."""

"""Driver-side output formatting (reference CLI output parity)."""

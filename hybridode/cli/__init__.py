"""Command-line entry points (argparse-compatible with the reference CLIs)."""

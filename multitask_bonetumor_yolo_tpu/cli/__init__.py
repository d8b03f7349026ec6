"""Command-line entry points: prepare_data, train, evaluate, infer, bench."""

"""CLI drivers: train/test entry points with the reference's flag surface."""

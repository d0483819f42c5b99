"""Sources: testdata table loaders, the deterministic synthetic sequence
generator, and the reference-format ASCII spectrum reader."""

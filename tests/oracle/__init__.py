"""Test-only oracle emulating the reference JS modem in float64 NumPy."""

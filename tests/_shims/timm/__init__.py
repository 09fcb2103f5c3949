"""Minimal timm shim — just enough surface for the reference model to import
on CPU in parity tests. Not a timm implementation."""

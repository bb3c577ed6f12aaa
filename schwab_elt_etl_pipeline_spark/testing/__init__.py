"""Test-support utilities (not needed at runtime)."""

"""Test-support utilities: synthetic MPEG-1 Layer III stream generation."""

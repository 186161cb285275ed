"""Host-side utilities: file formats, stats, DNA generation."""

"""Static data resources (palette tables, reference bbox-annotation list)."""

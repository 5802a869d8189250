"""End-to-end pipeline builders."""

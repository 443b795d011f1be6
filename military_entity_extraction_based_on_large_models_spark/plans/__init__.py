"""Plans: end-to-end pipeline composition, lineage manifests, resumability."""

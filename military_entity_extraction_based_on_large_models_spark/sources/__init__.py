"""Sources: document corpus readers, gazetteer dictionaries, synthetic fixtures."""

"""Sources: testdata/domain table loaders and external-lookup stand-ins."""

"""Analytics + training-data operators over the testdata tables."""

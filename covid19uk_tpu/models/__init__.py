"""Model layer: SEIR state-transition process, CovidUK joint density, NGM."""

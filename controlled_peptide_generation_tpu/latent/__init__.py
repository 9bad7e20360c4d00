from . import gmm, logreg, density, class_sampler

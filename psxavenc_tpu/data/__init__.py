# Package marker so setuptools ships data/*.npz (see pyproject package-data).

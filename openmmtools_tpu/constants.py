"""Physical constants in internal MD units.

Internal unit system (fixed; mirrors OpenMM's internal MD units so numbers are
directly comparable to the reference stack):

* length      : nanometer (nm)
* time        : picosecond (ps)
* mass        : atomic mass unit (amu = g/mol)
* energy      : kilojoule/mole (kJ/mol)
* charge      : elementary charge (e)
* temperature : kelvin (K)
* pressure    : bar

With these units velocity is nm/ps and kB*T is in kJ/mol.

Reference: ``/root/reference/openmmtools/constants.py:1-18`` defines kB,
ONE_4PI_EPS0 and STANDARD_STATE_VOLUME via openmm.unit; here they are plain
floats in the internal unit system.
"""

# Boltzmann constant, kJ/mol/K (CODATA via R = N_A * k_B).
kB = 0.008314462618153239  # kJ/(mol K)

# Coulomb constant 1/(4 pi eps0) in kJ mol^-1 nm e^-2. Matches the value OpenMM
# hard-codes so electrostatic energies agree bit-for-bit in double precision
# (see reference constants.py:12-15 discussion of E_CHARGE/EPSILON0).
ONE_4PI_EPS0 = 138.93545764438198

# Standard state volume for 1 M concentration: 1 L / N_A in nm^3.
STANDARD_STATE_VOLUME = 1.660538921  # nm^3

# Pressure conversion: 1 bar in kJ/(mol nm^3).
# 1 bar = 1e5 Pa = 1e5 J/m^3 = 1e5 * 1e-27 J/nm^3 * N_A / 1000 kJ/mol
# = 1e5 * 1e-27 * 6.02214076e23 / 1e3 ... = 0.0602214076 kJ/(mol nm^3)
BAR_TO_KJ_PER_MOL_NM3 = 0.06022140760000001

# Avogadro constant (1/mol), occasionally needed for unit conversions.
AVOGADRO = 6.02214076e23

"""Model catalog: analytic/molecular test systems + molecular file loaders.

TPU-native port of the reference's testsystems catalog
(``/root/reference/openmmtools/testsystems.py``, ~68 systems) — the
correctness oracle for integrators, samplers, and alchemy.
"""

from openmmtools_tpu.models.testsystems import (  # noqa: F401
    TestSystem,
    AlanineDipeptideImplicit,
    AlanineDipeptideVacuum,
    HarmonicOscillator,
    PowerOscillator,
    HarmonicOscillatorArray,
    CustomExternalForcesTestSystem,
    Diatom,
    IdealGas,
    LennardJonesCluster,
    LennardJonesFluid,
    LennardJonesPair,
    WCAFluid,
    get_available_testsystems,
)
from openmmtools_tpu.models.testsystems import (  # noqa: F401
    AlanineDipeptideExplicit,
    BenzeneTolueneImplicit,
    CustomGBForceSystem,
    DNADodecamerExplicit,
    MethanolBox,
    TolueneImplicit,
    TolueneImplicitHCT,
    TolueneImplicitOBC1,
    TolueneImplicitOBC2,
    TolueneVacuum,
    ConstrainedDiatomicFluid,
    ConstrainedDipolarFluid,
    ConstraintCoupledHarmonicOscillator,
    CustomLennardJonesFluidMixture,
    DHFRExplicit,
    DiatomicFluid,
    DipolarFluid,
    DoubleWellChain_WCAFluid,
    DoubleWellDimer_WCAFluid,
    HostGuestExplicit,
    HostGuestImplicit,
    HostGuestVacuum,
    LennardJonesGrid,
    LysozymeImplicit,
    MolecularIdealGas,
    SodiumChlorideCrystal,
    UnconstrainedDiatomicFluid,
    UnconstrainedDipolarFluid,
)
from openmmtools_tpu.models.water import (  # noqa: F401
    AlchemicalWaterBox,
    DischargedWaterBox,
    DischargedWaterBoxHsites,
    FiveSiteWaterBox,
    FlexibleDischargedWaterBox,
    FlexiblePMEWaterBox,
    FlexibleReactionFieldWaterBox,
    FlexibleWaterBox,
    FourSiteWaterBox,
    GiantFlexibleDischargedWaterBox,
    GiantFlexibleWaterBox,
    PMEWaterBox,
    WaterBox,
    WaterCluster,
)

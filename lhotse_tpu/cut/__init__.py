# Placeholder during bring-up; replaced by the full cut package.
class Cut: pass
class CutSet: pass
class MonoCut: pass
class MultiCut: pass
class PaddingCut: pass
class MixedCut: pass

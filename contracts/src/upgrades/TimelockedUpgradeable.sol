// SPDX-License-Identifier: MIT
pragma solidity ^0.8.25;

/// @notice Upgrade base with timelock-gated upgrades and a guardian role.
///
/// @dev Fresh implementation of the surface the reference consumes from
///      `@succinctx/upgrades/TimelockedUpgradeable.sol` (reference
///      contracts/src/VectorX.sol:5,13,83): a UUPS-style upgradeable
///      contract where `upgradeTo` is callable only by the TIMELOCK_ROLE
///      (intended holder: a `Timelock` controller, so every upgrade waits
///      out a public delay) while day-to-day admin ops are gated on the
///      GUARDIAN_ROLE via `onlyGuardian`.
///
///      All base bookkeeping (initialized flag, role grants) lives in
///      unstructured keccak-derived slots, so child contracts own the
///      sequential storage layout from slot 0 — new child variables must
///      still only ever be appended, as in any upgradeable contract.
abstract contract TimelockedUpgradeable {
    /// @dev ERC-1967 implementation slot:
    ///      bytes32(uint256(keccak256("eip1967.proxy.implementation")) - 1)
    bytes32 internal constant _IMPLEMENTATION_SLOT =
        0x360894a13ba1a3210667c828492db98dca3e2076cc3735a920a3ca505d382bbc;

    /// @dev Unstructured slot holding the initialized flag.
    bytes32 private constant _INITIALIZED_SLOT =
        keccak256("vectorx.timelocked_upgradeable.initialized");

    /// @dev Domain separator for per-(role, account) grant slots.
    bytes32 private constant _ROLE_DOMAIN =
        keccak256("vectorx.timelocked_upgradeable.role");

    bytes32 public constant GUARDIAN_ROLE = keccak256("GUARDIAN_ROLE");
    bytes32 public constant TIMELOCK_ROLE = keccak256("TIMELOCK_ROLE");

    event Upgraded(address indexed implementation);
    event RoleGranted(bytes32 indexed role, address indexed account);
    event RoleRevoked(bytes32 indexed role, address indexed account);

    error AlreadyInitialized();
    error OnlyGuardian();
    error OnlyTimelock();
    error ImplementationNotContract();

    modifier initializer() {
        bytes32 slot = _INITIALIZED_SLOT;
        uint256 done;
        assembly {
            done := sload(slot)
        }
        if (done != 0) revert AlreadyInitialized();
        assembly {
            sstore(slot, 1)
        }
        _;
    }

    modifier onlyGuardian() {
        if (!hasRole(GUARDIAN_ROLE, msg.sender)) revert OnlyGuardian();
        _;
    }

    modifier onlyTimelock() {
        if (!hasRole(TIMELOCK_ROLE, msg.sender)) revert OnlyTimelock();
        _;
    }

    /// @dev Child `initialize` calls this with (guardian, timelock holder);
    ///      the reference passes the guardian for both
    ///      (reference contracts/src/VectorX.sol:83).
    function __TimelockedUpgradeable_init(address _guardian, address _timelock)
        internal
    {
        _setRole(GUARDIAN_ROLE, _guardian, true);
        _setRole(TIMELOCK_ROLE, _timelock, true);
    }

    function hasRole(bytes32 _role, address _account)
        public
        view
        returns (bool granted)
    {
        bytes32 slot = _roleSlot(_role, _account);
        assembly {
            granted := sload(slot)
        }
    }

    /// @notice Grant a role; only the timelock may change role membership.
    function grantRole(bytes32 _role, address _account) external onlyTimelock {
        _setRole(_role, _account, true);
    }

    /// @notice Revoke a role; only the timelock may change role membership.
    function revokeRole(bytes32 _role, address _account) external onlyTimelock {
        _setRole(_role, _account, false);
    }

    /// @notice Point the proxy at a new implementation. Timelock-gated, so
    ///         when TIMELOCK_ROLE is held by a `Timelock` controller every
    ///         upgrade is publicly scheduled `minDelay` in advance.
    function upgradeTo(address _newImplementation) external onlyTimelock {
        if (_newImplementation.code.length == 0) {
            revert ImplementationNotContract();
        }
        bytes32 slot = _IMPLEMENTATION_SLOT;
        assembly {
            sstore(slot, _newImplementation)
        }
        emit Upgraded(_newImplementation);
    }

    /// @notice Current implementation address (ERC-1967 slot).
    function getImplementation() external view returns (address impl) {
        bytes32 slot = _IMPLEMENTATION_SLOT;
        assembly {
            impl := sload(slot)
        }
    }

    function _roleSlot(bytes32 _role, address _account)
        private
        pure
        returns (bytes32)
    {
        return keccak256(abi.encode(_ROLE_DOMAIN, _role, _account));
    }

    function _setRole(bytes32 _role, address _account, bool _granted) private {
        bytes32 slot = _roleSlot(_role, _account);
        assembly {
            sstore(slot, _granted)
        }
        if (_granted) {
            emit RoleGranted(_role, _account);
        } else {
            emit RoleRevoked(_role, _account);
        }
    }
}

// SPDX-License-Identifier: MIT
pragma solidity ^0.8.25;

/// @notice Minimal operation timelock: the intended holder of
///         `TimelockedUpgradeable.TIMELOCK_ROLE`.
///
/// @dev Self-contained stand-in for the TimelockController the reference's
///      succinctx upgrade stack assumes behind its TIMELOCK_ROLE: an admin
///      schedules a call (target, value, data, salt), anyone can execute it
///      once `minDelay` has elapsed, and the admin can cancel before
///      execution. Granting this contract the TIMELOCK_ROLE on VectorX
///      makes every `upgradeTo`/`grantRole` wait out a public delay.
contract Timelock {
    uint256 public immutable minDelay;
    address public admin;

    /// @dev operation id => timestamp at which it becomes executable
    ///      (0 = unknown, 1 = already executed).
    mapping(bytes32 => uint256) public readyAt;

    uint256 private constant _DONE = 1;

    event OperationScheduled(
        bytes32 indexed id,
        address indexed target,
        uint256 value,
        bytes data,
        uint256 readyAt
    );
    event OperationExecuted(bytes32 indexed id);
    event OperationCancelled(bytes32 indexed id);
    event AdminChanged(address indexed oldAdmin, address indexed newAdmin);

    error OnlyAdmin();
    error OperationAlreadyScheduled();
    error OperationNotReady();
    error OperationCallFailed();

    modifier onlyAdmin() {
        if (msg.sender != admin) revert OnlyAdmin();
        _;
    }

    constructor(uint256 _minDelay, address _admin) {
        minDelay = _minDelay;
        admin = _admin;
    }

    function operationId(
        address _target,
        uint256 _value,
        bytes calldata _data,
        bytes32 _salt
    ) public pure returns (bytes32) {
        return keccak256(abi.encode(_target, _value, _data, _salt));
    }

    function schedule(
        address _target,
        uint256 _value,
        bytes calldata _data,
        bytes32 _salt
    ) external onlyAdmin returns (bytes32 id) {
        id = operationId(_target, _value, _data, _salt);
        if (readyAt[id] != 0) revert OperationAlreadyScheduled();
        readyAt[id] = block.timestamp + minDelay;
        emit OperationScheduled(id, _target, _value, _data, readyAt[id]);
    }

    function execute(
        address _target,
        uint256 _value,
        bytes calldata _data,
        bytes32 _salt
    ) external payable {
        bytes32 id = operationId(_target, _value, _data, _salt);
        uint256 t = readyAt[id];
        if (t <= _DONE || block.timestamp < t) revert OperationNotReady();
        readyAt[id] = _DONE;
        (bool ok,) = _target.call{value: _value}(_data);
        if (!ok) revert OperationCallFailed();
        emit OperationExecuted(id);
    }

    function cancel(bytes32 _id) external onlyAdmin {
        if (readyAt[_id] <= _DONE) revert OperationNotReady();
        readyAt[_id] = 0;
        emit OperationCancelled(_id);
    }

    function setAdmin(address _newAdmin) external {
        // only via a scheduled self-call: the admin handoff itself waits
        // out the delay
        if (msg.sender != address(this)) revert OnlyAdmin();
        emit AdminChanged(admin, _newAdmin);
        admin = _newAdmin;
    }
}
